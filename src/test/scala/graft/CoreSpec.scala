package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Golden vectors from the Iceberg spec (Appendix B: 32-bit hash
  * requirements) and the reference's test_transforms.py. */
class TransformsSpec extends AnyFunSuite {

  test("bucket hash golden vectors (Iceberg spec Appendix B)") {
    assert(Transforms.hashLong(34L) === 2017239379)
    assert(Transforms.hashString("iceberg") === 1210000089)
    // date 2017-11-16 = 17486 days, hashed as long
    assert(Transforms.hashLong(17486L) === -653330422)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert(Transforms.hashLong(1510871468000000L) === -2047944441)
    // decimal 14.20 unscaled 1420
    assert(Transforms.hashDecimal(java.math.BigInteger.valueOf(1420)) === -500754589)
  }

  test("bucket transform applies mod after hash") {
    val b = BucketTransform(16)
    assert(b.apply(34, IInt) === (2017239379 & Int.MaxValue) % 16)
    assert(b.apply("iceberg", IString) === (1210000089 & Int.MaxValue) % 16)
    assert(b.apply(null, IInt) === null)
  }

  test("truncate") {
    val t = TruncateTransform(10)
    assert(t.apply(1, IInt) === 0)
    assert(t.apply(-1, IInt) === -10)
    assert(t.apply(99L, ILong) === 90L)
    assert(TruncateTransform(3).apply("iceberg", IString) === "ice")
    assert(TruncateTransform(3).apply("ab", IString) === "ab")
    // decimal truncate 10.65 W=50 -> 10.50 (ref test_transforms)
    assert(TruncateTransform(50).apply(new java.math.BigDecimal("10.65"),
      IDecimal(9, 2)) === new java.math.BigDecimal("10.50"))
  }

  test("time transforms epoch ordinals") {
    // 2017-12-01 10:30:00 = 1512124200000000 micros
    val m = 1512124200000000L
    assert(YearTransform.apply(m, ITimestamp) === 47)
    assert(MonthTransform.apply(m, ITimestamp) === 575)
    assert(DayTransform.apply(m, ITimestamp) === 17501)
    assert(HourTransform.apply(m, ITimestamp) === 420034)
    // pre-epoch: 1969-12-31 23:59:59 floors to -1
    val neg = -1000000L
    assert(DayTransform.apply(neg, ITimestamp) === -1)
    assert(YearTransform.apply(neg, ITimestamp) === -1)
    // human strings
    assert(MonthTransform.toHumanString(575, ITimestamp) === "2017-12")
    assert(DayTransform.toHumanString(17501, ITimestamp) === "2017-12-01")
  }

  test("transform parse round-trip") {
    for (s <- Seq("identity", "bucket[16]", "truncate[4]", "year", "month", "day", "hour", "void"))
      assert(Transform.parse(s).name === s)
  }
}

class ConversionsSpec extends AnyFunSuite {
  test("single-value binary round-trip") {
    val cases: Seq[(IceType, Any)] = Seq(
      (IBoolean, true), (IInt, 42), (ILong, 42L), (IFloat, 1.5f), (IDouble, 2.5),
      (IDate, 19000), (ITimestamp, 1510871468000000L), (IString, "héllo"),
      (IDecimal(9, 2), new java.math.BigDecimal("14.20")))
    cases.foreach { case (t, v) =>
      assert(Conversions.fromBytes(t, Conversions.toBytes(t, v)) === v, s"type $t")
    }
  }
  test("int is little-endian 4 bytes") {
    assert(Conversions.toBytes(IInt, 1).toSeq === Seq[Byte](1, 0, 0, 0))
  }
}

class BoundTruncationSpec extends AnyFunSuite {
  import graft.table.StatsHarvester._

  test("lower bound truncates to prefix") {
    assert(truncateLower("abcdefghijklmnopqrs") === "abcdefghijklmnop")
    assert(truncateLower("short") === "short")
  }

  test("upper bound truncates with code-point increment") {
    assert(truncateUpper("abcdefghijklmnopqrs") === Some("abcdefghijklmnoq"))
    assert(truncateUpper("short") === Some("short"))
    // incremented bound must still be >= any string with the prefix
    val s = "abcdefghijklmnopzzzzz"
    assert(truncateUpper(s).get > s.substring(0, 16))
    assert(s < truncateUpper(s).get)
    // surrogate-safe: max code point rolls back to previous position
    val tricky = "abcdefghijklmno" + new String(Character.toChars(Character.MAX_CODE_POINT)) + "x"
    val u = truncateUpper(tricky)
    assert(u === Some("abcdefghijklmnp"))
  }
}

class ExprSpec extends AnyFunSuite {
  val schema = Schema(Seq(
    NestedField(1, "id", ILong, required = true),
    NestedField(2, "name", IString),
    NestedField(3, "ts", ITimestamp),
    NestedField(4, "price", IDouble),
    NestedField(5, "day", IDate)))

  test("parser handles the reference grammar") {
    assert(ExprParser.parse("id > 5") === Gt("id", 5L))
    assert(ExprParser.parse("5 < id") === Gt("id", 5L))
    assert(ExprParser.parse("name = 'x' and id <= 3") === And(Eq("name", "x"), LtEq("id", 3L)))
    assert(ExprParser.parse("id in (1, 2, 3)") === In("id", Seq(1L, 2L, 3L)))
    assert(ExprParser.parse("id NOT IN (1)") === NotIn("id", Seq(1L)))
    assert(ExprParser.parse("name IS NULL") === IsNull("name"))
    assert(ExprParser.parse("price is not nan") === NotNaN("price"))
    assert(ExprParser.parse("name LIKE 'abc%'") === StartsWith("name", "abc"))
    assert(ExprParser.parse("id BETWEEN 2 AND 7") === And(GtEq("id", 2L), LtEq("id", 7L)))
    assert(ExprParser.parse("not (id = 1 or id = 2)") === Not(Or(Eq("id", 1L), Eq("id", 2L))))
    intercept[IllegalArgumentException](ExprParser.parse("name LIKE 'a%b%'"))
  }

  test("rewrite_to_dnf distributes AND over OR; plain-format export") {
    val b = Binder.bind(schema,
      ExprParser.parse("(id = 1 or id = 2) and (name = 'a' or name = 'b')"))
    val dnf = Exprs.rewriteToDnf(b)
    assert(dnf.size === 4) // cross product of disjuncts
    assert(dnf.forall {
      case BAnd(_: BoundPred, _: BoundPred) => true
      case _ => false
    })
    // NOT is eliminated before distribution
    val n = Binder.bind(schema, ExprParser.parse("not (id = 1 and name = 'a')"))
    assert(Exprs.rewriteToDnf(n).size === 2)
    val plain = Exprs.toPlainFormat(
      Binder.bind(schema, ExprParser.parse("id > 3 and name is null")))
    assert(plain === Seq(Seq(("id", ">", 3L), ("name", "==", null))))
  }

  test("exotic partition-field names survive the manifest round-trip") {
    import graft.meta._
    val s = Schema(Seq(NestedField(1, "ts", ITimestamp), NestedField(2, "v", ILong)))
    val spec = PartitionSpec(0, Seq(PartitionField(1, 1000, "day(ts)", DayTransform)))
    val f = DataFile(content = FileContent.Data, filePath = "/x/y.parquet",
      fileFormat = "PARQUET", partition = Seq(19724), recordCount = 10,
      fileSizeInBytes = 100)
    val e = ManifestEntry(status = EntryStatus.Added, snapshotId = 1L,
      dataSequenceNumber = 1L, fileSequenceNumber = 1L, dataFile = f)
    val path = java.nio.file.Files.createTempDirectory("mio").toString + "/m1.avro"
    ManifestIO.writeManifest(path, Seq(e), spec, s)
    val back = ManifestIO.readManifest(path, spec, s)
    assert(back.size === 1)
    assert(back.head.dataFile.partition === Seq(19724))
  }

  test("make_compatible_name sanitizes avro-hostile names injectively") {
    import Schema.makeCompatibleName
    assert(makeCompatibleName("valid_name") === "valid_name")
    assert(makeCompatibleName("_ok2") === "_ok2")
    assert(makeCompatibleName("9col") === "_9col")
    assert(makeCompatibleName("a.b") === "a_x2Eb")
    assert(makeCompatibleName("a b") === "a_x20b")
    assert(makeCompatibleName("day(ts)") === "day_x28ts_x29")
    // the lossy replaceAll would collide these two
    assert(makeCompatibleName("a.b") !== makeCompatibleName("a_b"))
    val s = Schema(Seq(NestedField(1, "a.b", ILong),
      NestedField(2, "nested", IStruct(Seq(NestedField(3, "x y", IString))))))
    val clean = Schema.sanitizeColumnNames(s)
    assert(clean.fields.head.name === "a_x2Eb")
    assert(clean.fields(1).fieldType.asInstanceOf[IStruct].fields.head.name === "x_x20y")
    assert(clean.fields.head.id === 1) // ids untouched
  }

  test("transform-term predicates parse and bind") {
    assert(ExprParser.parse("day(ts) = '2024-01-02'") ===
      Eq("ts", "2024-01-02", Some(DayTransform)))
    assert(ExprParser.parse("bucket[16](id) = 3") ===
      Eq("id", 3L, Some(BucketTransform(16))))
    assert(ExprParser.parse("year(ts) >= 54") === GtEq("ts", 54L, Some(YearTransform)))
    // binds with the transform's result type (day → epoch days)
    val b = Binder.bind(schema, ExprParser.parse("day(ts) = '2024-01-02'"))
    assert(b === BEq(schema.byId(3), "ts", 19724, Some(DayTransform)))
    // evaluates against raw micros
    assert(Evaluator.eval(b, Map(3 -> (19724L * 86400000000L + 5L: Any))))
    assert(!Evaluator.eval(b, Map(3 -> (19725L * 86400000000L: Any))))
  }

  test("bind coerces literals to internal repr") {
    val b = Binder.bind(schema, ExprParser.parse("ts >= '2024-01-02T00:00:00'"))
    assert(b === BGtEq(schema.byId(3), "ts", 1704153600000000L, None))
    val d = Binder.bind(schema, ExprParser.parse("day = '2024-01-02'"))
    assert(d === BEq(schema.byId(5), "day", 19724, None))
  }

  test("bind folds degenerate cases") {
    // IsNull on required field
    assert(Binder.bind(schema, IsNull("id")) === BFalse)
    assert(Binder.bind(schema, NotNull("id")) === BTrue)
    // NaN on non-floating
    assert(Binder.bind(schema, IsNaN("id")) === BFalse)
    // NOT pushed down at bind time
    assert(Binder.bind(schema, Not(Eq("id", 1L))) === BNotEq(schema.byId(1), "id", 1L, None))
    // int overflow sentinels on a hypothetical int field
    val s2 = Schema(Seq(NestedField(1, "i", IInt)))
    assert(Binder.bind(s2, Lt("i", 5000000000L)) === BTrue)
    assert(Binder.bind(s2, Gt("i", 5000000000L)) === BFalse)
  }

  test("evaluator over records") {
    val e = Binder.bind(schema, ExprParser.parse("id > 5 and name like 'ab%'"))
    assert(Evaluator.eval(e, Map(1 -> 6L, 2 -> "abc")))
    assert(!Evaluator.eval(e, Map(1 -> 6L, 2 -> "xbc")))
    assert(!Evaluator.eval(e, Map(1 -> 4L, 2 -> "abc")))
    assert(!Evaluator.eval(e, Map(1 -> 6L, 2 -> null)))
  }
}

class MetricsSpec extends AnyFunSuite {
  import graft.meta._

  val schema = Schema(Seq(
    NestedField(1, "id", ILong, required = true),
    NestedField(2, "cat", IString)))

  def file(lo: Long, hi: Long, nulls: Long = 0, rows: Long = 100): DataFile =
    DataFile(0, "f", "PARQUET", Nil, rows, 1000,
      valueCounts = Map(1 -> rows, 2 -> rows),
      nullValueCounts = Map(1 -> 0L, 2 -> nulls),
      lowerBounds = Map(1 -> lo), upperBounds = Map(1 -> hi))

  test("inclusive metrics pruning") {
    val b = Binder.bind(schema, ExprParser.parse("id > 50"))
    assert(Evaluators.rowsMightMatch(b, file(0, 100)))
    assert(!Evaluators.rowsMightMatch(b, file(0, 50)))
    assert(Evaluators.rowsMightMatch(b, file(51, 60)))
    val in = Binder.bind(schema, ExprParser.parse("id in (7, 200)"))
    assert(Evaluators.rowsMightMatch(in, file(0, 100)))
    assert(!Evaluators.rowsMightMatch(in, file(101, 150)))
  }

  test("strict metrics: whole-file delete decision") {
    val b = Binder.bind(schema, ExprParser.parse("id > 50"))
    assert(Evaluators.rowsMustMatch(b, file(51, 100)))
    assert(!Evaluators.rowsMustMatch(b, file(50, 100)))
    assert(!Evaluators.rowsMustMatch(b, file(0, 49)))
  }

  test("inclusive projection + partition pruning with day transform") {
    val s = Schema(Seq(NestedField(1, "ts", ITimestamp)))
    val spec = PartitionSpec(0, Seq(PartitionField(1, 1000, "ts_day", DayTransform)))
    val b = Binder.bind(s, ExprParser.parse("ts >= '2024-01-02T00:00:00'"))
    val proj = Evaluators.inclusiveProjection(s, spec, b)
    // day(2024-01-02) = 19724
    assert(Evaluators.partitionMatches(spec, proj, Seq(19724)))
    assert(Evaluators.partitionMatches(spec, proj, Seq(19725)))
    assert(!Evaluators.partitionMatches(spec, proj, Seq(19723)))
  }

  test("bucket projection prunes equality only") {
    val s = Schema(Seq(NestedField(1, "id", ILong)))
    val spec = PartitionSpec(0, Seq(PartitionField(1, 1000, "id_bucket", BucketTransform(8))))
    val b = Binder.bind(s, ExprParser.parse("id = 34"))
    val proj = Evaluators.inclusiveProjection(s, spec, b)
    val expected = (Transforms.hashLong(34L) & Int.MaxValue) % 8
    assert(Evaluators.partitionMatches(spec, proj, Seq(expected)))
    assert(!Evaluators.partitionMatches(spec, proj, Seq((expected + 1) % 8)))
    // ranges don't constrain buckets
    val r = Binder.bind(s, ExprParser.parse("id > 34"))
    assert(Evaluators.inclusiveProjection(s, spec, r) === BTrue)
  }

  test("residual folds identity partitions") {
    val s = Schema(Seq(NestedField(1, "cat", IString), NestedField(2, "x", ILong)))
    val spec = PartitionSpec(0, Seq(PartitionField(1, 1000, "cat", IdentityTransform)))
    val b = Binder.bind(s, ExprParser.parse("cat = 'a' and x > 5"))
    val res = Evaluators.residual(s, spec, b, Seq("a"))
    assert(res === BGt(s.byId(2), "x", 5L, None))
    assert(Evaluators.residual(s, spec, b, Seq("b")) === BFalse)
  }

  test("residual folds transform partitions: day ranges, truncate, bucket") {
    val s = Schema(Seq(NestedField(1, "ts", ITimestamp), NestedField(2, "name", IString),
      NestedField(3, "id", ILong)))
    val spec = PartitionSpec(0, Seq(
      PartitionField(1, 1000, "day", DayTransform),
      PartitionField(2, 1001, "pre", TruncateTransform(2)),
      PartitionField(3, 1002, "bkt", BucketTransform(8))))
    def res(e: String, part: Seq[Any]) =
      Evaluators.residual(s, spec, Exprs.rewriteNot(Binder.bind(s, ExprParser.parse(e))), part)

    // day 19724 = 2024-01-02; boundary-aligned >= folds strictly TRUE on
    // the boundary day itself (decrement trick), FALSE strictly before
    assert(res("ts >= '2024-01-02'", Seq(19724, null, null)) === BTrue)
    assert(res("ts >= '2024-01-02'", Seq(19725, null, null)) === BTrue)
    assert(res("ts >= '2024-01-02'", Seq(19723, null, null)) === BFalse)
    // a mid-day boundary can't fold on the boundary day — stays residual
    assert(res("ts > '2024-01-02T12:00:00'", Seq(19724, null, null)).isInstanceOf[BoundPred])
    assert(res("ts > '2024-01-02T12:00:00'", Seq(19725, null, null)) === BTrue)
    // a predicate on the transformed term folds exactly
    assert(res("day(ts) = '2024-01-02'", Seq(19724, null, null)) === BTrue)
    assert(res("day(ts) = '2024-01-02'", Seq(19723, null, null)) === BFalse)
    // truncate[2] string prefix blocks are ordered
    assert(res("name >= 'c'", Seq(null, "ca", null)) === BTrue)
    assert(res("name = 'xy'", Seq(null, "ab", null)) === BFalse)
    assert(res("name like 'ab%'", Seq(null, "ab", null)) === BTrue)
    // a pv shorter than the truncate width IS the exact row value
    assert(res("name = 'a'", Seq(null, "a", null)) === BTrue)
    // bucket: wrong bucket folds false; same bucket stays (collisions)
    val bkt34 = (Transforms.hashLong(34L) & Int.MaxValue) % 8
    assert(res("id = 34", Seq(null, null, bkt34)).isInstanceOf[BoundPred])
    assert(res("id = 34", Seq(null, null, (bkt34 + 1) % 8)) === BFalse)
    // null partition value under a null-preserving transform = all-null rows
    assert(res("ts is null", Seq(null, null, null)) === BTrue)
    assert(res("ts is not null", Seq(null, null, null)) === BFalse)
    assert(res("ts >= '2024-01-02'", Seq(null, null, null)) === BFalse)
    // conjunction folds per-source
    assert(res("ts >= '2024-01-02' and id = 34", Seq(19725, null, (bkt34 + 1) % 8)) === BFalse)
  }

  test("v3 tail types: unknown/geometry/geography parse and round-trip") {
    // types.py:946-:1031 — parse patterns mirror the reference's
    // GEOMETRY_REGEX/GEOGRAPHY_REGEX (types.py:71/:73) and reprs its
    // model serializers (default CRS/algorithm elide the parameters)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def parse(s: String) =
      graft.meta.MetadataJson.typeFromJson(mapper.getNodeFactory.textNode(s))
    assert(parse("unknown") === IUnknown)
    assert(IUnknown.toSpark === org.apache.spark.sql.types.NullType)
    assert(parse("geometry") === IGeometry("OGC:CRS84"))
    assert(parse("geometry('EPSG:4326')") === IGeometry("EPSG:4326"))
    assert(parse("""geometry("EPSG:4326")""") === IGeometry("EPSG:4326"))
    assert(parse("geography") === IGeography("OGC:CRS84", "spherical"))
    assert(parse("geography('EPSG:4326')") === IGeography("EPSG:4326", "spherical"))
    assert(parse("geography('EPSG:4326', 'planar')") === IGeography("EPSG:4326", "planar"))
    // repr round-trip, defaults elided exactly like the reference
    Seq(IUnknown, IGeometry(), IGeometry("EPSG:4326"), IGeography(),
        IGeography("EPSG:4326"), IGeography("EPSG:4326", "planar")).foreach { t =>
      assert(parse(t.repr) === t, s"round-trip ${t.repr}")
    }
    assert(IGeometry().repr === "geometry")
    assert(IGeography("EPSG:4326", "planar").repr === "geography('EPSG:4326', 'planar')")
    // WKB-binary runtime surface (ref io/pyarrow.py:825 large_binary fallback)
    assert(IGeometry().toSpark === org.apache.spark.sql.types.BinaryType)
    assert(IGeography().toSpark === org.apache.spark.sql.types.BinaryType)
    // unknown promotes to any primitive (v3 spec), nothing promotes to it
    assert(SchemaConv.promotable(IUnknown, ILong))
    assert(SchemaConv.promotable(IUnknown, IString))
    assert(!SchemaConv.promotable(ILong, IUnknown))
    // variant: in the v3 spec but absent from the reference — typed reject
    val e = intercept[UnsupportedOperationException](parse("variant"))
    assert(e.getMessage.contains("variant"))
    // genuinely unknown strings stay IllegalArgumentException
    intercept[IllegalArgumentException](parse("gibberish"))
  }

  test("v3 ns timestamps: parse, repr round-trip, micros-domain codecs") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def parse(s: String) =
      graft.meta.MetadataJson.typeFromJson(mapper.getNodeFactory.textNode(s))
    assert(parse("timestamp_ns") === ITimestampNs)
    assert(parse("timestamptz_ns") === ITimestamptzNs)
    assert(ITimestampNs.repr === "timestamp_ns")
    assert(ITimestamptzNs.repr === "timestamptz_ns")
    // public Spark surface is the us-downcast timestamp
    assert(ITimestampNs.toSpark === org.apache.spark.sql.types.TimestampNTZType)
    assert(ITimestamptzNs.toSpark === org.apache.spark.sql.types.TimestampType)
    // stats/partition bytes hold NANOS; the engine domain is MICROS —
    // decode floor-divides (incl. pre-epoch values), encode scales up
    val ns = 1700000000123456789L
    val bytes = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(ns).array()
    assert(Conversions.fromBytes(ITimestampNs, bytes) === 1700000000123456L)
    val neg = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(-1500L).array()
    assert(Conversions.fromBytes(ITimestamptzNs, neg) === -2L)
    val enc = Conversions.toBytes(ITimestampNs, 1700000000123456L)
    assert(java.nio.ByteBuffer.wrap(enc)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong === 1700000000123456000L)
  }
}
