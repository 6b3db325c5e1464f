"""Test shim for the `pyiceberg_core` Rust extension (not installable in
this zero-egress sandbox): just enough of the `transform` surface for the
reference's pyarrow partition path (_pyiceberg_transform_wrapper) to fan
out day-partitioned writes. Exact integer floor-division semantics —
matching the spec's day transform, including pre-epoch values."""

import pyarrow as pa


class _Transform:
    @staticmethod
    def day(array):
        t = array.type
        if pa.types.is_timestamp(t):
            unit = {"s": 1, "ms": 1_000,
                    "us": 1_000_000, "ns": 1_000_000_000}[t.unit]
            per_day = 86_400 * unit
            raw = array.cast(pa.int64())
            out = [None if v is None else v // per_day for v in raw.to_pylist()]
            return pa.array(out, pa.int32())
        if pa.types.is_date32(t):
            return array.cast(pa.int32())
        raise ValueError(f"day transform shim: unsupported type {t}")

    @staticmethod
    def year(array):
        raise NotImplementedError("shim implements only `day`")

    month = year
    hour = year
    bucket = year
    truncate = year


transform = _Transform()
