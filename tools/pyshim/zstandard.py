"""zstandard stand-in backed by pyarrow's bundled zstd codec. pyarrow
needs the decompressed size up front, so the zstd frame header's
Frame_Content_Size field is parsed here (graft writes its own puffin
blobs uncompressed; this path serves foreign zstd-compressed blobs)."""
import pyarrow as pa


def _frame_content_size(data):
    if len(data) < 5 or int.from_bytes(data[:4], "little") != 0xFD2FB528:
        raise ValueError("not a zstd frame")
    fhd = data[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    did_flag = fhd & 0x3
    pos = 5
    if not single_segment:
        pos += 1  # window descriptor
    pos += (0, 1, 2, 4)[did_flag]
    if fcs_flag == 0:
        if single_segment:
            return data[pos]
        raise ValueError("zstd frame without content size")
    n = (1, 2, 4, 8)[fcs_flag]
    v = int.from_bytes(data[pos:pos + n], "little")
    if fcs_flag == 1:
        v += 256
    return v


class ZstdDecompressor:
    def decompress(self, data, max_output_size=-1):
        size = _frame_content_size(bytes(data))
        return pa.Codec("zstd").decompress(data, decompressed_size=size, asbytes=True)


class ZstdCompressor:
    def compress(self, data):
        return pa.Codec("zstd").compress(data, asbytes=True)
