"""Minimal pure-python stand-in for pyroaring's BitMap, sufficient for
pyiceberg's deletion-vector decode path (table/deletion_vector.py):
`BitMap().deserialize(bytes)`, `serialize()` (length-faithful — the
caller advances its cursor by len(serialize())), iteration in sorted
order, and equality. Implements the standard 32-bit roaring portable
layout (array / bitmap / run containers)."""

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4


class BitMap:
    def __init__(self, values=None):
        self._values = sorted(set(values)) if values else []
        self._raw = None

    @classmethod
    def deserialize(cls, buf):
        # classmethod in pyroaring; also callable on an instance
        bm = cls()
        view = bytes(buf)
        pos = 0
        cookie = int.from_bytes(view[pos:pos + 4], "little")
        pos += 4
        if (cookie & 0xFFFF) == SERIAL_COOKIE:
            size = (cookie >> 16) + 1
            n_run_bytes = (size + 7) // 8
            run_flags = view[pos:pos + n_run_bytes]
            pos += n_run_bytes
            has_offsets = size >= NO_OFFSET_THRESHOLD
        elif cookie == SERIAL_COOKIE_NO_RUN:
            size = int.from_bytes(view[pos:pos + 4], "little")
            pos += 4
            run_flags = b""
            has_offsets = True
        else:
            raise ValueError(f"Unknown roaring cookie: {cookie}")

        keys, cards = [], []
        for i in range(size):
            keys.append(int.from_bytes(view[pos:pos + 2], "little"))
            cards.append(int.from_bytes(view[pos + 2:pos + 4], "little") + 1)
            pos += 4
        if has_offsets:
            pos += 4 * size  # containers are contiguous; offsets unused

        def is_run(i):
            return bool(run_flags) and (run_flags[i // 8] >> (i % 8)) & 1

        values = []
        for i in range(size):
            hb = keys[i] << 16
            if is_run(i):
                n_runs = int.from_bytes(view[pos:pos + 2], "little")
                pos += 2
                for _ in range(n_runs):
                    start = int.from_bytes(view[pos:pos + 2], "little")
                    length = int.from_bytes(view[pos + 2:pos + 4], "little")
                    pos += 4
                    values.extend(hb | v for v in range(start, start + length + 1))
            elif cards[i] <= 4096:
                for _ in range(cards[i]):
                    values.append(hb | int.from_bytes(view[pos:pos + 2], "little"))
                    pos += 2
            else:
                for w in range(1024):
                    word = int.from_bytes(view[pos:pos + 8], "little")
                    pos += 8
                    while word:
                        b = (word & -word).bit_length() - 1
                        values.append(hb | (w * 64 + b))
                        word &= word - 1
        bm._values = sorted(values)
        bm._raw = view[:pos]
        return bm

    def serialize(self):
        if self._raw is not None:
            return self._raw
        # no-run portable layout (only needed for round-trip length math)
        containers = {}
        for v in self._values:
            containers.setdefault(v >> 16, []).append(v & 0xFFFF)
        out = bytearray()
        out += SERIAL_COOKIE_NO_RUN.to_bytes(4, "little")
        out += len(containers).to_bytes(4, "little")
        for key in sorted(containers):
            out += key.to_bytes(2, "little")
            out += (len(containers[key]) - 1).to_bytes(2, "little")
        offset = 8 + 8 * len(containers)
        sizes = []
        for key in sorted(containers):
            n = len(containers[key])
            sizes.append(2 * n if n <= 4096 else 8192)
        for sz in sizes:
            out += offset.to_bytes(4, "little")
            offset += sz
        for key in sorted(containers):
            vs = containers[key]
            if len(vs) <= 4096:
                for v in vs:
                    out += v.to_bytes(2, "little")
            else:
                words = [0] * 1024
                for v in vs:
                    words[v >> 6] |= 1 << (v & 63)
                for w in words:
                    out += w.to_bytes(8, "little")
        return bytes(out)

    def add(self, v):
        if v not in self._values:
            import bisect
            bisect.insort(self._values, v)
        self._raw = None

    def __iter__(self):
        return iter(self._values)

    def __len__(self):
        return len(self._values)

    def __contains__(self, v):
        import bisect
        i = bisect.bisect_left(self._values, v)
        return i < len(self._values) and self._values[i] == v

    def __eq__(self, other):
        return isinstance(other, BitMap) and self._values == list(other)

    def __repr__(self):
        return f"BitMap({self._values[:8]}{'...' if len(self._values) > 8 else ''})"


class FrozenBitMap(BitMap):
    pass
