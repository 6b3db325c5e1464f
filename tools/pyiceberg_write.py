"""Cross-client check, write direction: create + append + delete a table
USING THE REFERENCE IMPLEMENTATION (pyiceberg from /root/reference), so
the graft engine can read back a genuinely foreign-written table.

A minimal file-backed catalog implements just enough of the Catalog ABC
for the create/append/delete flows (the in-tree InMemoryCatalog needs
sqlalchemy, which this sandbox lacks) — all metadata construction and
commit application is pyiceberg's own (new_table_metadata /
update_table_metadata).

Usage: pyiceberg_write.py <warehouse-dir> <source parquet> <limit>
Prints: metadata file path of the final version.
"""
import sys
import uuid


def main():
    wh, src, limit = sys.argv[1], sys.argv[2], int(sys.argv[3])

    import pyarrow.parquet as pq

    # the sandbox's pyarrow (16.x) predates the store_decimal_as_integer
    # writer kwarg pyiceberg passes — drop it (decimals land as FLBA,
    # equally valid parquet)
    _orig_writer = pq.ParquetWriter

    class _CompatWriter(_orig_writer):
        def __init__(self, *a, **k):
            k.pop("store_decimal_as_integer", None)
            super().__init__(*a, **k)

    pq.ParquetWriter = _CompatWriter

    from pyiceberg.catalog import Catalog, PropertiesUpdateSummary
    from pyiceberg.io import load_file_io
    from pyiceberg.table import CommitTableResponse, Table
    from pyiceberg.table.metadata import new_table_metadata
    from pyiceberg.table.sorting import UNSORTED_SORT_ORDER
    from pyiceberg.table.update import update_table_metadata
    from pyiceberg.partitioning import UNPARTITIONED_PARTITION_SPEC
    from pyiceberg.serializers import ToOutputFile
    from pyiceberg.typedef import EMPTY_DICT

    class FileCatalog(Catalog):
        """metadata-pointer-in-memory catalog over a local warehouse."""

        def __init__(self, name, warehouse):
            super().__init__(name, warehouse=warehouse)
            self._tables = {}

        def create_table(self, identifier, schema, location=None,
                         partition_spec=UNPARTITIONED_PARTITION_SPEC,
                         sort_order=UNSORTED_SORT_ORDER, properties=EMPTY_DICT):
            ident = self.identifier_to_tuple(identifier)
            schema = self._convert_schema_if_needed(schema)
            location = location or f"{self.properties['warehouse']}/{'/'.join(ident)}"
            metadata = new_table_metadata(
                schema=schema, partition_spec=partition_spec,
                sort_order=sort_order, location=location, properties=properties)
            io = load_file_io({}, location)
            mpath = f"{location}/metadata/v1-{uuid.uuid4()}.metadata.json"
            ToOutputFile.table_metadata(metadata, io.new_output(mpath))
            self._tables[ident] = mpath
            return self.load_table(identifier)

        def load_table(self, identifier):
            ident = self.identifier_to_tuple(identifier)
            mpath = self._tables[ident]
            io = load_file_io({}, mpath)
            from pyiceberg.serializers import FromInputFile
            metadata = FromInputFile.table_metadata(io.new_input(mpath))
            return Table(identifier=ident, metadata=metadata,
                         metadata_location=mpath, io=io, catalog=self)

        def commit_table(self, table, requirements, updates):
            ident = table.name()
            base = self.load_table(ident)
            for req in requirements:
                req.validate(base.metadata)
            new_metadata = update_table_metadata(base.metadata, updates)
            loc = new_metadata.location
            mpath = f"{loc}/metadata/v{1 + len(new_metadata.metadata_log)}-{uuid.uuid4()}.metadata.json"
            io = load_file_io({}, loc)
            ToOutputFile.table_metadata(new_metadata, io.new_output(mpath))
            self._tables[ident] = mpath
            return CommitTableResponse(metadata=new_metadata, metadata_location=mpath)

        # unused surface for this flow
        def create_table_transaction(self, *a, **k): raise NotImplementedError
        def register_table(self, *a, **k): raise NotImplementedError
        def drop_table(self, *a, **k): raise NotImplementedError
        def purge_table(self, *a, **k): raise NotImplementedError
        def rename_table(self, *a, **k): raise NotImplementedError
        def create_namespace(self, *a, **k): return None
        def drop_namespace(self, *a, **k): return None
        def list_tables(self, *a, **k): return list(self._tables)
        def list_namespaces(self, *a, **k): return []
        def load_namespace_properties(self, *a, **k): return {}
        def update_namespace_properties(self, *a, **k):
            return PropertiesUpdateSummary(removed=[], updated=[], missing=[])
        def list_views(self, *a, **k): return []
        def drop_view(self, *a, **k): raise NotImplementedError
        def view_exists(self, *a, **k): return False
        def create_view(self, *a, **k): raise NotImplementedError
        def load_view(self, *a, **k): raise NotImplementedError
        def register_view(self, *a, **k): raise NotImplementedError
        def namespace_exists(self, *a, **k): return True
        def table_exists(self, identifier):
            return self.identifier_to_tuple(identifier) in self._tables
        def supports_server_side_planning(self): return False

    mode = sys.argv[4] if len(sys.argv) > 4 else "plain"
    cat = FileCatalog("fc", wh)
    arrow = pq.read_table(src)
    if limit > 0:
        arrow = arrow.slice(0, limit)
    if mode == "partitioned":
        from pyiceberg.partitioning import PartitionField, PartitionSpec
        from pyiceberg.transforms import IdentityTransform
        from pyiceberg.schema import assign_fresh_schema_ids
        # pre-assign real field ids (the raw conversion leaves -1s, which
        # would mis-resolve the partition source inside new_table_metadata)
        schema = assign_fresh_schema_ids(Catalog._convert_schema_if_needed(arrow.schema))
        src_id = schema.find_field("o_orderstatus").field_id
        spec = PartitionSpec(PartitionField(
            source_id=src_id, field_id=1000,
            transform=IdentityTransform(), name="st"))
        t = cat.create_table(("db", "t"), schema=schema, partition_spec=spec)
        t.append(arrow)
        t = cat.load_table(("db", "t"))
        t.delete("o_orderkey <= 100")
    elif mode == "day":
        # DAY-transform partitioned table + pyiceberg's own PARTITIONED
        # OVERWRITE (io/pyarrow.py _determine_partitions fans the arrow
        # table out per partition tuple): rows o_orderkey <= 50 are
        # replaced by copies with o_totalprice = 0.0 in one overwrite
        # commit — delete files + per-partition data files, all written by
        # the reference's machinery.
        import pyarrow.compute as pc
        from pyiceberg.partitioning import PartitionField, PartitionSpec
        from pyiceberg.transforms import DayTransform
        from pyiceberg.schema import assign_fresh_schema_ids
        schema = assign_fresh_schema_ids(Catalog._convert_schema_if_needed(arrow.schema))
        src_id = schema.find_field("o_orderdate").field_id
        spec = PartitionSpec(PartitionField(
            source_id=src_id, field_id=1000,
            transform=DayTransform(), name="od_day"))
        t = cat.create_table(("db", "t"), schema=schema, partition_spec=spec)
        t.append(arrow)
        t = cat.load_table(("db", "t"))
        # partition-ALIGNED overwrite (day boundary): phase 1 drops whole
        # files metadata-only, phase 2 re-appends through
        # _determine_partitions. Deliberately no PARTIAL-file rewrite:
        # pyiceberg's rewrite phase builds its manifest-pruning predicate
        # as EqualTo(source_column, partition_value) — a day ORDINAL
        # compared against a TIMESTAMP column — so for non-identity
        # transforms the evaluator never matches and the rewritten
        # originals stay live (rows duplicate; its own reader returns
        # them too). Pinned as the reference's gap in PyInteropSpec.
        import datetime as _dt
        dates = sorted(x.as_py() for x in arrow.column("o_orderdate"))
        cut_day = dates[len(dates) * 3 // 4].date()
        cut = cut_day.isoformat() + "T00:00:00"
        mask = pc.greater_equal(
            arrow.column("o_orderdate"),
            _dt.datetime.combine(cut_day, _dt.time.min))
        replaced = arrow.filter(mask).set_column(
            arrow.schema.get_field_index("o_totalprice"), "o_totalprice",
            pc.multiply(arrow.filter(mask).column("o_totalprice"), 0.0))
        t.overwrite(replaced, overwrite_filter=f"o_orderdate >= '{cut}'")
        print("CUT=" + cut)
    else:
        t = cat.create_table(("db", "t"), schema=arrow.schema)
        t.append(arrow)
        t = cat.load_table(("db", "t"))
        t.delete("o_orderkey <= 100")
    print(cat._tables[("db", "t")])


if __name__ == "__main__":
    main()
