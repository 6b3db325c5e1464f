"""Cross-client check: read a graft-written Iceberg table THROUGH the
reference implementation (pyiceberg from /root/reference, with the tiny
dependency shims in tools/pyshim) and print `rows<TAB>sum` for a column.

Usage: pyiceberg_read.py <metadata.json path> <sum column> [row-filter]
"""
import sys

def main():
    meta, col = sys.argv[1], sys.argv[2]
    row_filter = sys.argv[3] if len(sys.argv) > 3 else None
    from pyiceberg.table import StaticTable
    import pyarrow.compute as pc
    t = StaticTable.from_metadata(meta)
    scan = t.scan(row_filter=row_filter) if row_filter else t.scan()
    arrow = scan.to_arrow()
    total = pc.sum(arrow.column(col)).as_py() if arrow.num_rows else 0
    print(f"{arrow.num_rows}\t{total}")

if __name__ == "__main__":
    main()
