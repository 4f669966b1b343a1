package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Mp3, Multimodal}
import graft.sources.Wkt

/** Source-layer queries (SURVEY.md §2 rows 21, 38): WKT round-trip parse
  * and the multimodal feature-extraction pipeline.
  */
object SourceQueries {

  /** Build WKT point strings from integer event coordinates, parse them
    * back with the Catalyst WKT parser, emit coordinates. The
    * construction uses integer tenths so string formatting is identical
    * across engines. */
  def qReadWkt(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.load(spark, dir, "events").select(
      col("event_id").cast("long").as("id"),
      Wkt.toWktPoint(col("event_id") * 73 % 1000,
        col("event_id") * 179 % 1000).as("wkt"))
    val p = Wkt.parsePoint(col("wkt"))
    raw.select(col("id"), col("wkt"),
      (p("x") / 10.0).as("px"), (p("y") / 10.0).as("py"))
  }

  /** MULTIPOLYGON-with-holes round trip: build a deterministic two-part
    * multipolygon per nation (part 1 carries a hole) as WKT, parse it
    * with the Catalyst ring parser, and emit per-ring vertex count,
    * shoelace area, perimeter and the ring body written back out —
    * parse -> compute -> write, all hash-checked. Integer-valued
    * coordinates make the string formatting identical across engines. */
  def qReadWktMultiPolygon(spark: SparkSession, dir: String): DataFrame = {
    import graft.geom.Geom
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    val g = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("pid"))
      .withColumn("x0", col("pid") * 7 % 50)
      .withColumn("y0", col("pid") * 13 % 50)
      .withColumn("w", lit(10) + col("pid") % 5)
      .withColumn("h", lit(8) + col("pid") % 7)
    def ringStr(xs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      concat(lit("(") +: xs.grouped(2).map { case Seq(x, y) =>
        concat(s(x), lit(" "), s(y))
      }.toSeq.flatMap(c => Seq(c, lit(", "))).dropRight(1) :+ lit(")"): _*)
    val x0 = col("x0"); val y0 = col("y0"); val w = col("w"); val h = col("h")
    val outer = ringStr(Seq(x0, y0, x0 + w, y0, x0 + w, y0 + h, x0, y0 + h,
      x0, y0))
    val hole = ringStr(Seq(x0 + 2, y0 + 2, x0 + 4, y0 + 2, x0 + 4, y0 + 4,
      x0 + 2, y0 + 4, x0 + 2, y0 + 2))
    val part2 = ringStr(Seq(x0 + 100, y0, x0 + 105, y0, x0 + 105, y0 + 5,
      x0 + 100, y0 + 5, x0 + 100, y0))
    val raw = g.select(col("pid"),
      concat(lit("MULTIPOLYGON (("), outer, lit(", "), hole, lit("), ("),
        part2, lit("))")).as("wkt"))
    raw
      .select(col("pid"),
        posexplode(Wkt.parseRings(col("wkt"))).as(Seq("ri0", "ring")))
      .select(col("pid"), (col("ri0") + 1).cast("long").as("ri"),
        size(col("ring")).cast("long").as("n_pts"),
        round(Geom.ringArea(col("ring")), 4).as("area"),
        round(Geom.ringPerimeter(col("ring")), 4).as("peri"),
        Wkt.toWktRing(col("ring")).as("ring_wkt"))
  }

  /** WKB round trip: build deterministic three-ring polygons per nation
    * (same generator as the WKT multipolygon query), WRITE them as real
    * OGC WKB bytes — alternating little/big endian by pid, so both byte
    * orders are load-bearing — PARSE the bytes back with the Catalyst
    * WKB reader, and emit per-ring vertex count, shoelace area,
    * perimeter and the ring re-serialized as text. n_bytes pins the
    * writer's exact layout size. Reference: read_spatialite
    * (core.py:423) reads geometry from a binary DB format; this is the
    * standard-layout binary analogue. */
  def qReadWkb(spark: SparkSession, dir: String): DataFrame = {
    import graft.geom.Geom
    import graft.sources.Wkb
    def pt(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      struct(x.cast("double").as("x"), y.cast("double").as("y"))
    val g = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("pid"))
      .withColumn("x0", col("pid") * 7 % 50)
      .withColumn("y0", col("pid") * 13 % 50)
      .withColumn("w", lit(10) + col("pid") % 5)
      .withColumn("h", lit(8) + col("pid") % 7)
    val x0 = col("x0"); val y0 = col("y0"); val w = col("w"); val h = col("h")
    val outer = array(pt(x0, y0), pt(x0 + w, y0), pt(x0 + w, y0 + h),
      pt(x0, y0 + h), pt(x0, y0))
    val hole = array(pt(x0 + 2, y0 + 2), pt(x0 + 4, y0 + 2),
      pt(x0 + 4, y0 + 4), pt(x0 + 2, y0 + 4), pt(x0 + 2, y0 + 2))
    val part2 = array(pt(x0 + 100, y0), pt(x0 + 105, y0),
      pt(x0 + 105, y0 + 5), pt(x0 + 100, y0 + 5), pt(x0 + 100, y0))
    val withWkb = g.select(col("pid"), (col("pid") % 2 === 0).as("ndr"),
      Wkb.writePolygon(array(outer, hole, part2),
        col("pid") % 2 === 0).as("wkb"))
    withWkb
      .select(col("pid"), col("ndr"),
        length(col("wkb")).cast("long").as("n_bytes"),
        posexplode(Wkb.parseRings(col("wkb"))).as(Seq("ri0", "ring")))
      .select(col("pid"), col("ndr"), col("n_bytes"),
        (col("ri0") + 1).cast("long").as("ri"),
        size(col("ring")).cast("long").as("n_pts"),
        round(Geom.ringArea(col("ring")), 4).as("area"),
        round(Geom.ringPerimeter(col("ring")), 4).as("peri"),
        Wkt.toWktRing(col("ring")).as("ring_wkt"))
  }

  /** GeoJSON (RFC 7946) feature roundtrip — the text-interchange
    * sibling of the WKT/WKB readers (r16, VERDICT r15 item 4;
    * reference anchor read_spatialite, core.py:423): the same
    * deterministic two-polygon MultiPolygon per nation (part 1 carries
    * a hole) is WRITTEN as a Feature line by `sources.GeoJson` (pure
    * concat/array_join over the array<array<array<struct<x,y>>>> ring
    * model, integer coords as bare longs), every 7th line TRUNCATED to
    * exercise the PERMISSIVE corrupt-record path (the qJsonlRoundtrip
    * contract — a crawl ingest never fails the task on bad bytes),
    * then PARSED back via from_json against the explicit nested schema
    * with RFC validation (Feature/MultiPolygon type tags, [x,y] pair
    * arity, §3.1.6 ring closure). Output: per-ring vertex count,
    * shoelace area, perimeter, the ring re-serialized as GeoJSON, and
    * the feature-level roundtrip md5-equality proof (writer ∘ parser
    * == identity); corrupt rows surface as parse_ok=false stubs. All
    * row-local — scan → map → explode, no shuffle; the oracle rebuilds
    * the same bytes and re-parses them with DuckDB's own JSON engine
    * (json_valid + nested-list cast), so a writer or parser bug on
    * either side breaks the hash. */
  def qReadGeojson(spark: SparkSession, dir: String): DataFrame = {
    import graft.geom.Geom
    import graft.sources.GeoJson
    def pt(x: Column, y: Column) =
      struct(x.cast("double").as("x"), y.cast("double").as("y"))
    val g = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("pid"))
      .withColumn("x0", col("pid") * 7 % 50)
      .withColumn("y0", col("pid") * 13 % 50)
      .withColumn("w", lit(10) + col("pid") % 5)
      .withColumn("h", lit(8) + col("pid") % 7)
    val x0 = col("x0"); val y0 = col("y0"); val w = col("w"); val h = col("h")
    val outer = array(pt(x0, y0), pt(x0 + w, y0), pt(x0 + w, y0 + h),
      pt(x0, y0 + h), pt(x0, y0))
    val hole = array(pt(x0 + 2, y0 + 2), pt(x0 + 4, y0 + 2),
      pt(x0 + 4, y0 + 4), pt(x0 + 2, y0 + 4), pt(x0 + 2, y0 + 2))
    val part2 = array(pt(x0 + 100, y0), pt(x0 + 105, y0),
      pt(x0 + 105, y0 + 5), pt(x0 + 100, y0 + 5), pt(x0 + 100, y0))
    val feat = GeoJson.writeFeature(col("pid"),
      array(array(outer, hole), array(part2)))
    val raw = g.select(col("pid"), feat.as("orig"))
      .select(col("pid"), col("orig"),
        when(col("pid") % 7 === 3, substring(col("orig"), 1, 60))
          .otherwise(col("orig")).as("gj"))
    val parsed = raw.select(col("pid"), col("orig"),
      GeoJson.parseFeature(col("gj")).as("p"))
    val good = parsed.filter(col("p").isNotNull)
      .select(col("pid"),
        (md5(GeoJson.writeFeature(col("p.pid"), col("p.polys")))
          === md5(col("orig"))).as("roundtrip"),
        posexplode(col("p.polys")).as(Seq("pi0", "poly")))
      .select(col("pid"), col("roundtrip"),
        (col("pi0") + 1).cast("long").as("pi"),
        posexplode(col("poly")).as(Seq("ri0", "ring")))
      .select(col("pid"), lit(true).as("parse_ok"), col("roundtrip"),
        col("pi"), (col("ri0") + 1).cast("long").as("ri"),
        size(col("ring")).cast("long").as("n_pts"),
        round(graft.geom.Geom.ringArea(col("ring")), 4).as("area"),
        round(Geom.ringPerimeter(col("ring")), 4).as("peri"),
        GeoJson.ringJson(col("ring")).as("ring_json"))
    val bad = parsed.filter(col("p").isNull)
      .select(col("pid"), lit(false).as("parse_ok"),
        lit(false).as("roundtrip"), lit(0L).as("pi"), lit(0L).as("ri"),
        lit(0L).as("n_pts"), lit(0.0).as("area"), lit(0.0).as("peri"),
        lit("").as("ring_json"))
    good.unionByName(bad)
  }

  /** GeoJSON generalized to ALL RFC 7946 kinds a 2026 geo file carries
    * (r17, VERDICT r16 item 5): Point / LineString / Polygon /
    * MultiPolygon features inside FEATURECOLLECTION framing, with BOTH
    * corrupt-record levels exercised — one whole collection truncated
    * mid-byte (malformed JSON → fc_ok=false stub, features lost as a
    * unit) and individual features carrying an unknown geometry kind
    * ("Blob", valid JSON → parse_ok=false stub, the rest of the
    * collection unaffected). Per nation one feature, kind cycling by
    * pid%4, grouped per region into 5 collections (collect_list sorted
    * by pid — deterministic framing). Every parsed feature normalizes
    * into the engine's ring model tagged with its kind and re-emits:
    * part/ring/vertex counts, kind-appropriate measures (open-path
    * length for LineString, Σ|ring area| for the polygon kinds), and
    * the writer∘parser md5 roundtrip proof per feature. Row-local
    * scan → group-by-region concat → explode — the single small
    * shuffle is the 5-collection assembly; the oracle rebuilds the
    * same bytes arithmetically and re-parses with DuckDB's JSON
    * engine. */
  def qReadGeojsonKinds(spark: SparkSession, dir: String): DataFrame = {
    import graft.geom.Geom
    import graft.sources.GeoJson
    def pt(x: Column, y: Column) =
      struct(x.cast("double").as("x"), y.cast("double").as("y"))
    val g = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("pid"),
        col("n_regionkey").cast("long").as("rkey"))
      .withColumn("x0", col("pid") * 7 % 50)
      .withColumn("y0", col("pid") * 13 % 50)
      .withColumn("w", lit(10) + col("pid") % 5)
      .withColumn("h", lit(8) + col("pid") % 7)
    val x0 = col("x0"); val y0 = col("y0"); val w = col("w"); val h = col("h")
    val outer = array(pt(x0, y0), pt(x0 + w, y0), pt(x0 + w, y0 + h),
      pt(x0, y0 + h), pt(x0, y0))
    val hole = array(pt(x0 + 2, y0 + 2), pt(x0 + 4, y0 + 2),
      pt(x0 + 4, y0 + 4), pt(x0 + 2, y0 + 4), pt(x0 + 2, y0 + 2))
    val part2 = array(pt(x0 + 100, y0), pt(x0 + 105, y0),
      pt(x0 + 105, y0 + 5), pt(x0 + 100, y0 + 5), pt(x0 + 100, y0))
    val kind = when(col("pid") % 4 === 0, "Point")
      .when(col("pid") % 4 === 1, "LineString")
      .when(col("pid") % 4 === 2, "Polygon")
      .otherwise("MultiPolygon")
    val polys = when(col("pid") % 4 === 0, array(array(array(pt(x0, y0)))))
      .when(col("pid") % 4 === 1,
        array(array(array(pt(x0, y0), pt(x0 + w, y0), pt(x0 + w, y0 + h)))))
      .when(col("pid") % 4 === 2, array(array(outer, hole)))
      .otherwise(array(array(outer, hole), array(part2)))
    // per-feature semantic corruption: an unknown kind, still valid
    // JSON — the collection survives, the one feature does not
    val kindC = when(col("pid") % 7 === 3, lit("Blob")).otherwise(kind)
    // tag may be the corrupt "Blob", but the coordinate bytes are
    // written at the shape's TRUE pid%4 depth — matching the oracle's
    // arithmetic rebuild byte-for-byte even for the corrupt features
    // (ADVICE r17: the old writer fell through to MultiPolygon depth)
    val feat = GeoJson.writeFeatureTagged(col("pid"), kindC, kind, polys)
    val fc = g.select(col("rkey"), struct(col("pid"), feat.as("f")).as("pf"))
      .groupBy("rkey")
      .agg(array_sort(collect_list(col("pf"))).as("pfs"))
      .select(col("rkey"), GeoJson.writeCollection(
        transform(col("pfs"), p => p.getField("f"))).as("fc_text"))
      // collection-level corruption: region 2's document truncated
      .select(col("rkey"),
        when(col("rkey") === 2, substring(col("fc_text"), 1, 60))
          .otherwise(col("fc_text")).as("gj"))
    val parsedFc = fc.select(col("rkey"),
      GeoJson.parseCollection(col("gj")).as("feats"))
    val feats = parsedFc.filter(col("feats").isNotNull)
      .select(col("rkey"), posexplode(col("feats")).as(Seq("fi0", "fstr")))
      .select(col("rkey"), col("fi0").cast("long").as("fi"), col("fstr"),
        GeoJson.parseFeatureAny(col("fstr")).as("p"))
    val sumRings = expr(
      "aggregate(p.polys, CAST(0 AS BIGINT), (a, pl) -> a + size(pl))")
    val sumPts = expr("aggregate(p.polys, CAST(0 AS BIGINT), (a, pl) -> " +
      "a + aggregate(pl, CAST(0 AS BIGINT), (b, r) -> b + size(r)))")
    val ring0 = element_at(element_at(col("p.polys"), 1), 1)
    val areaSum = expr("aggregate(p.polys, CAST(0 AS DOUBLE), (a, pl) -> " +
      "a + aggregate(pl, CAST(0 AS DOUBLE), (b, r) -> b + " +
      "abs(aggregate(zip_with(r, concat(slice(r, 2, size(r)), " +
      "slice(r, 1, 1)), (p1, p2) -> p1.x * p2.y - p2.x * p1.y), " +
      "CAST(0 AS DOUBLE), (s, v) -> s + v)) / 2))")
    val good = feats.filter(col("p").isNotNull)
      .select(col("rkey"), col("fi"), lit(true).as("fc_ok"),
        lit(true).as("parse_ok"), col("p.pid").as("pid"),
        col("p.kind").as("kind"),
        size(col("p.polys")).cast("long").as("n_parts"),
        sumRings.as("n_rings"), sumPts.as("n_pts"),
        round(when(col("p.kind") === "LineString",
          Geom.lineLength(ring0)).otherwise(lit(0.0)), 4).as("length_r4"),
        round(when(col("p.kind").isin("Polygon", "MultiPolygon"),
          areaSum).otherwise(lit(0.0)), 4).as("area_r4"),
        (md5(GeoJson.writeFeatureAny(col("p.pid"), col("p.kind"),
          col("p.polys"))) === md5(col("fstr"))).as("roundtrip"))
    val badFeat = feats.filter(col("p").isNull)
      .select(col("rkey"), col("fi"), lit(true).as("fc_ok"),
        lit(false).as("parse_ok"), lit(-1L).as("pid"), lit("").as("kind"),
        lit(0L).as("n_parts"), lit(0L).as("n_rings"), lit(0L).as("n_pts"),
        lit(0.0).as("length_r4"), lit(0.0).as("area_r4"),
        lit(false).as("roundtrip"))
    val badFc = parsedFc.filter(col("feats").isNull)
      .select(col("rkey"), lit(-1L).as("fi"), lit(false).as("fc_ok"),
        lit(false).as("parse_ok"), lit(-1L).as("pid"), lit("").as("kind"),
        lit(0L).as("n_parts"), lit(0L).as("n_rings"), lit(0L).as("n_pts"),
        lit(0.0).as("length_r4"), lit(0.0).as("area_r4"),
        lit(false).as("roundtrip"))
    good.unionByName(badFeat).unionByName(badFc)
  }

  /** Bucketed co-located join as a first-class result row: write orders
    * and lineitem bucketed+sorted by order key (the shuffle paid ONCE,
    * at write time), read them back through the catalog, join on the
    * bucket key and roll up per order. The zero-exchange property of
    * this join is plan-asserted in OperatorsSpec ("bucketed tables join
    * with zero exchanges"); this query makes the component's RESULTS
    * oracle-checked too (the oracle is the plain join — bucketing must
    * never change answers). l_quantity values are small integers in
    * doubles, so the per-order sums are exact in either engine. */
  def qBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Bucketed
    // Tag includes the applicationId so concurrent JVMs on the same data
    // dir never clobber each other's table files (same policy as the
    // persisted IVF index). Within a session the write is idempotent
    // (writeBucketedOnce): the layout is built once and every later run
    // — bench warm-up, measured runs — pays only the co-located join,
    // which is the property this query exists to measure.
    val tag = (dir + "_" + spark.sparkContext.applicationId)
      .replaceAll("[^A-Za-z0-9]", "_")
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").cast("long").as("k"), col("l_quantity"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").cast("long").as("k"),
        col("o_custkey").cast("long").as("o_custkey"))
    Bucketed.cleanupOnExit(s"/tmp/graft_bucket_q/li$tag")
    Bucketed.cleanupOnExit(s"/tmp/graft_bucket_q/o$tag")
    Bucketed.writeBucketedOnce(li, s"graft_li_q$tag",
      s"/tmp/graft_bucket_q/li$tag", "k", 8)
    Bucketed.writeBucketedOnce(o, s"graft_o_q$tag",
      s"/tmp/graft_bucket_q/o$tag", "k", 8)
    Bucketed.readBucketed(spark, s"graft_o_q$tag")
      .join(Bucketed.readBucketed(spark, s"graft_li_q$tag"), "k")
      .groupBy(col("k").as("o_orderkey"), col("o_custkey"))
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"))
  }

  def qMultimodal(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(
      Multimodal.mediaTable(Tables.spread(Tables.load(spark, dir, "documents")))).toDF()

  def qMultimodalWav(spark: SparkSession, dir: String): DataFrame =
    Multimodal.wavFeatures(Tables.spread(Tables.load(spark, dir, "documents")))

  def qMultimodalBmp(spark: SparkSession, dir: String): DataFrame =
    Multimodal.bmpFeatures(Tables.spread(Tables.load(spark, dir, "documents")))

  def qMultimodalExif(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Exif.exifFeatures(Tables.spread(Tables.load(spark, dir, "documents")))

  def qMultimodalJpegExif(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Exif.jpegExifFeatures(
      Tables.spread(Tables.load(spark, dir, "documents")))

  def qAudioResample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.resampleFeatures(Tables.spread(Tables.load(spark, dir, "documents")))

  def qMultimodalVideo(spark: SparkSession, dir: String): DataFrame =
    Multimodal.videoFrameFeatures(Tables.spread(Tables.load(spark, dir, "documents")))

  def qVideoKeyframes(spark: SparkSession, dir: String): DataFrame =
    Multimodal.videoKeyframes(Tables.spread(Tables.load(spark, dir, "documents")))

  def qMultimodalMp4(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mp4FrameFeatures(Tables.spread(Tables.load(spark, dir, "documents")))

  def qMultimodalMp3(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mp3Features(Tables.spread(Tables.load(spark, dir, "documents")))

  /** Full Layer III SPECTRAL decode (side info -> scalefactors ->
    * Huffman -> requantize -> alias -> windowed IMDCT + overlap-add):
    * per-granule per-subband energies over genuinely CODED frames. */
  def qMultimodalMp3Spectral(spark: SparkSession, dir: String): DataFrame =
    Mp3.mp3SpectralFeatures(Tables.spread(Tables.load(spark, dir, "documents")))
      .select(col("doc_id"), col("gi"), col("subband"),
        round(col("e_spec"), 6).as("e_spec"),
        round(col("e_ola"), 6).as("e_ola"))

  /** Layer III decode all the way to PCM (r10): spectral decode ->
    * windowed IMDCT + overlap-add -> frequency inversion -> polyphase
    * synthesis filterbank (V FIFO + N-matrixing + 512-tap windowed
    * 16-tap accumulation) -> per-granule PCM energy + peak. */
  def qMultimodalMp3Pcm(spark: SparkSession, dir: String): DataFrame =
    Mp3.mp3PcmFeatures(Tables.spread(Tables.load(spark, dir, "documents")))
      .select(col("doc_id"), col("gi"),
        round(col("e_pcm"), 6).as("e_pcm"),
        round(col("peak_pcm"), 6).as("peak_pcm"))

  /** Image near-dup pairs (r10): real BMP decode of the group-keyed
    * corpus -> 60-bit dHash -> 4x15-bit band join -> Hamming verify. */
  def qImagePhash(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ImageHash.dhashPairs(
      Tables.spread(Tables.load(spark, dir, "documents")), maxHamming = 10)

  /** H.264 Annex-B structure parse (r10): real start-code NAL walk,
    * emulation-prevention unescape, exp-Golomb SPS/PPS/slice-header
    * decode with the SPS-drives-slice-width dependency. */
  def qMultimodalH264(spark: SparkSession, dir: String): DataFrame =
    graft.operators.H264.h264Features(Tables.spread(Tables.load(spark, dir, "documents")))

  /** H.264 macroblock layer (r11): I_16x16 DC-only CAVLC residual
    * decode + intra DC prediction + spec reconstruction per
    * macroblock, on the constrained one-slice-per-MB-row corpus (see
    * operators.H264's macroblock section). */
  def qMultimodalH264Mb(spark: SparkSession, dir: String): DataFrame =
    graft.operators.H264.h264MbFeatures(
      Tables.spread(Tables.load(spark, dir, "documents")))

  /** Multi-coefficient CAVLC stream (r12): TotalCoeff 0-3 per DC block
    * exercises the 2<=nC<4 coeff_token table, TrailingOnes signs, the
    * suffixLength level progression, total_zeros TC=2/3 and run_before
    * — everything the single-coefficient corpus left stated-
    * unreachable. Row-local, like every codec path. */
  def qMultimodalH264Ac(spark: SparkSession, dir: String): DataFrame =
    graft.operators.H264.h264AcFeatures(
      Tables.spread(Tables.load(spark, dir, "documents")))

  /** CBP luma-15 stream (r12): Intra_16x16_2_0_15 MBs — the DC block
    * PLUS sixteen Intra16x16ACLevel 4x4 blocks per MB with the real
    * spatial nC neighbour contexts, the full 8.5.12.2 integer inverse
    * core transform and both 8.5.12.1 requantization branches.
    * Row-local. */
  def qMultimodalH264Cbp(spark: SparkSession, dir: String): DataFrame =
    graft.operators.H264.h264CbpFeatures(
      Tables.spread(Tables.load(spark, dir, "documents")))

  /** PDF text extraction (r12): real PDF 1.4 files — xref offsets
    * measured at assembly, FlateDecode content streams, BT/Tf/Td/Tj
    * operator replay with relative line-matrix semantics. Row-local. */
  def qMultimodalPdf(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Pdf.pdfFeatures(
      Tables.spread(Tables.load(spark, dir, "documents")))

  /** PDF 1.5 text extraction (r14): cross-reference STREAMS (W-array
    * fields under the PNG Up predictor) + /ObjStm-packed objects +
    * the full §7.3.4.2 escape set (named classes + octal). Row-local. */
  def qMultimodalPdfXrefstream(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Pdf.pdfXFeatures(
      Tables.spread(Tables.load(spark, dir, "documents")))

  /** PDF incremental update (r14): append-only revision section — new
    * generation of page 0's content stream + a second /XRef stream
    * with /Index subsections and /Prev chaining; entries merge
    * newest-wins, so the revision shadows the still-present original
    * bytes. Row-local. */
  def qMultimodalPdfIncremental(spark: SparkSession,
                                dir: String): DataFrame =
    graft.operators.Pdf.pdfXIncFeatures(
      Tables.spread(Tables.load(spark, dir, "documents")))

  /** Format sniffing (r12): magic-byte routing over real bytes from
    * all nine codecs, with a tamper stratum that must come out
    * 'unknown'. Row-local. */
  def qFormatSniff(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sniff.sniffFeatures(
      Tables.spread(Tables.load(spark, dir, "documents")))

  /** Multi-page TIFF (r12): 1-3 IFDs chained through the next-IFD
    * pointer, PageNumber count=2 SHORT inline, chain order and
    * declared totals REQUIREd. Row-local. */
  def qMultimodalTiffPages(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Exif.tiffPageFeatures(
      Tables.spread(Tables.load(spark, dir, "documents")))

  def qMultimodalAudioFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.wavFrameFeatures(Tables.spread(Tables.load(spark, dir, "documents")))

  /** VAD segmentation (r11) — the silence-trimming curation step over
    * the audio corpus: real WAV decode of the silence-planted clips,
    * per-frame energies, then speech SEGMENTS via gaps-and-islands
    * (island key = frame − row_number within the doc, the
    * duplicated-spans move); per segment start/end/frame-count,
    * duration in exact ms (64 samples at 8 kHz = 8 ms/frame) and total
    * energy. Row-local decode → one bounded window per doc (≤8 frames
    * per clip; at scale the window is per-clip, never corpus-wide). */
  def qAudioVadSegments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = Multimodal.wavVadFrames(
      Tables.spread(Tables.load(spark, dir, "documents")))
    val speech = frames.filter(col("energy") > 0)
    val wDoc = Window.partitionBy("doc_id").orderBy("frame_idx")
    val seg = speech
      .withColumn("isl", col("frame_idx") - row_number().over(wDoc))
      .groupBy(col("doc_id"), col("isl"))
      .agg(min("frame_idx").as("start_frame"),
        max("frame_idx").as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum("energy").as("sum_energy"))
    seg
      .withColumn("seg_idx",
        row_number().over(Window.partitionBy("doc_id")
          .orderBy("start_frame")).cast("long"))
      .select(col("doc_id"), col("seg_idx"), col("start_frame"),
        col("end_frame"), col("n_frames"),
        (col("n_frames") * 8L).as("duration_ms"), col("sum_energy"))
  }

  /** Audio landmark fingerprint matching (r10, operators.AudioFp):
    * integer-WHT spectral peaks → (p1, p2, Δt) landmark hashes →
    * inverted-index join → offset-consistent votes; snippets (frames
    * 1..3 of every 10th track) must match their source at dt=1. */
  def qAudioFingerprint(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AudioFp.fingerprintMatch(
      Tables.spread(Tables.load(spark, dir, "documents")))

  def qMultimodalAugment(spark: SparkSession, dir: String): DataFrame =
    Multimodal.augmentFeatures(Tables.spread(Tables.load(spark, dir, "documents")))

  def qMultimodalPng(spark: SparkSession, dir: String): DataFrame =
    Multimodal.pngFeatures(Tables.spread(Tables.load(spark, dir, "documents")))

  def qMultimodalJpeg(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Jpeg.jpegFeatures(Tables.spread(Tables.load(spark, dir, "documents")))

  def qMultimodalJpeg420(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Jpeg.jpeg420Features(Tables.spread(Tables.load(spark, dir, "documents")))

  /** CRS-tagged layer read: the same WKT point source read TWICE — once
    * as a GEOGRAPHIC layer (EPSG:4326, integer-degree lon/lat) and once
    * as a PROJECTED layer (EPSG:32633, integer meters) — with the
    * distance semantics selected by the column-metadata CRS tag, not by
    * the query: haversine km when the tag is geographic, planar
    * euclidean in CRS units otherwise. Closes the reference
    * read_spatialite `crs`/epsg parameter (core.py:423,460-463). */
  def qCrsDistance(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Crs
    val e = Tables.load(spark, dir, "events")
      .select(col("event_id").cast("long").as("id"))
    def layer(epsg: Long, x1: Column, y1: Column,
              x2: Column, y2: Column): DataFrame =
      e.select(col("id"),
        Wkt.toWktPoint(x1, y1).as("w1"), Wkt.toWktPoint(x2, y2).as("w2"))
        .select(col("id"),
          Crs.withCrs(Wkt.parsePoint(col("w1")), "g1", epsg),
          Crs.withCrs(Wkt.parsePoint(col("w2")), "g2", epsg))
    val geo = layer(4326L,
      col("id") * 73 % 360 - 180, col("id") * 179 % 160 - 80,
      col("id") * 31 % 360 - 180, col("id") * 97 % 160 - 80)
    val prj = layer(32633L,
      col("id") * 73 % 100000, col("id") * 179 % 100000,
      col("id") * 31 % 100000, col("id") * 97 % 100000)
    // the OUTPUT epsg/geographic columns come from the tag the layer
    // carries, not from this query's literals — reading them back is
    // the point of the test
    def out(df: DataFrame): DataFrame = {
      val epsg = Crs.epsgOf(df, "g1").get
      df.select(col("id"), lit(epsg).as("epsg"),
        lit(Crs.isGeographic(epsg)).as("geographic"),
        round(Crs.pointDistance(df, "g1", "g2"), 3).as("dist"))
    }
    out(geo).unionByName(out(prj))
  }

  /** DEFLATE/gzip roundtrip over the corpus — the compression layer a
    * 100 TB crawl pipeline reads through (RFC 1951/1952, the engine's
    * own codec: operators.Deflate). Mode picked by payload byte length
    * so ALL THREE RFC block types run against real data (stored < 64 B,
    * fixed < 512 B, dynamic above) and the oracle can name each doc's
    * mode from STRLEN alone. Row-local map, no shuffle; the md5 of the
    * DECODED bytes against DuckDB's md5 of the original text proves the
    * roundtrip byte-exactly (CRC-32 + ISIZE already verified in-band).
    */
  def qDeflateRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Deflate
    Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val mode =
          if (raw.length < 64) Deflate.Stored
          else if (raw.length < 512) Deflate.Fixed
          else Deflate.Dynamic
        val gz = Deflate.gzipMember(raw, mode, Some(s"doc-$id"))
        val (dec, fname, used) = Deflate.gunzipMember(gz, 0)
        require(used == gz.length && fname.contains(s"doc-$id"),
          s"gzip member framing broken for doc $id")
        val modeName = mode match {
          case Deflate.Stored => "stored"
          case Deflate.Fixed => "fixed"
          case Deflate.Dynamic => "dynamic"
        }
        (id, modeName, dec)
      }).toDF("doc_id", "mode", "payload")
      .select(col("doc_id"), col("mode"),
        length(decode(col("payload"), "UTF-8")).cast("long").as("n_chars"),
        length(col("payload")).cast("long").as("payload_bytes"),
        md5(col("payload")).as("digest"))
  }

  /** WARC build + ingest roundtrip (sources.Warc) — pack the corpus
    * into .warc.gz files (one gzip member per record, the splittable
    * Common Crawl convention), then read every record back through the
    * full stack: gzip member walk (CRC-32/ISIZE verified) -> WARC/1.0
    * header parse -> Content-Length payload framing. One shuffle total
    * (the pack's grouping on warc_file); the read side is a row-local
    * flatMap — at crawl scale each task walks its own members
    * independently. Every header field and payload byte is
    * oracle-pinned. */
  def qWarcIngest(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Warc
    val files = Warc.writeFiles(
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("source"), col("text")),
      docsPerFile = 64)
    Warc.readFiles(files)
      .select(col("doc_id"), col("warc_file"), col("target_uri"),
        col("warc_date"),
        length(decode(col("payload"), "UTF-8")).cast("long").as("n_chars"),
        length(col("payload")).cast("long").as("payload_bytes"),
        md5(col("payload")).as("digest"))
  }

  /** JSONL corpus roundtrip — THE LLM training-data interchange format:
    * every doc serialized as one to_json line (escaping of quotes,
    * newlines and unicode is what's under test), re-parsed with
    * from_json against an explicit schema, with every 50th line
    * TRUNCATED to exercise the PERMISSIVE corrupt-record path a real
    * crawl ingest hits constantly. Row-local both directions — scan →
    * map, no shuffle; the oracle derives the expected parse output
    * directly from the documents table (parse_ok/roundtrip are the
    * engine-side proof the serializer and parser invert). */
  def qJsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("text", StringType)))
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("lang"), col("source"))
    val line = to_json(struct(col("doc_id"), col("lang"), col("source"),
      col("text")))
    val corrupted = d.select(col("doc_id"), col("text").as("orig"),
        line.as("line"))
      .select(col("doc_id"), col("orig"),
        when(col("doc_id") % 50 === 0,
          substring(col("line"), 1, 10)).otherwise(col("line")).as("line"))
    val p = from_json(col("line"), schema)
    corrupted.select(col("doc_id"), p.as("p"), col("orig"))
      .select(col("doc_id"),
        col("p.doc_id").isNotNull.as("parse_ok"),
        col("p.lang").as("lang"), col("p.source").as("source"),
        length(col("p.text")).cast("long").as("n_chars"),
        md5(col("p.text")).as("digest"),
        coalesce(col("p.text") === col("orig"), lit(false)).as("roundtrip"))
  }

  /** Image-banding recall eval — the dedup_eval move for the image
    * modality: the banded candidate pairs priced against the ALL-PAIRS
    * Hamming truth the bands exist to avoid (affordable on a bounded
    * eval corpus, which is the point); precision is 1 by construction
    * (candidates verify on the same exact Hamming), recall < 1 exactly
    * when a true pair differs in all 4 bands — the pigeonhole trade
    * quantified per threshold.
    *
    * The eval corpus is a FIXED-SIZE slice (2000 docs regardless of
    * sf), keyed by a multiplicative doc hash so membership is
    * deterministic and re-shard stable (the qSampleQuota top-K move):
    * the all-pairs truth join is O(cap²) forever, not O(corpus²) —
    * corpus-wide ground truth is exactly the join banding exists to
    * avoid, so production prices its threshold on a bounded sample. */
  def qImageHashEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val all = Tables.load(spark, dir, "documents")
    val evalIds = all
      .select(col("doc_id").cast("long").as("doc_id"))
      .withColumn("hk",
        (col("doc_id") * lit(2654435761L)) % lit(1000000007L))
      .orderBy(col("hk"), col("doc_id")).limit(2000)
      .select(col("doc_id").as("eid"))
    val d = all.join(broadcast(evalIds),
      all("doc_id").cast("long") === col("eid"), "left_semi")
    val sigs = graft.operators.ImageHash.imageSignatures(d)
      .localCheckpoint() // both sides of the truth self-join
    val truth = sigs.select(col("doc_id").as("ida"), col("sig").as("sa"))
      .join(sigs.select(col("doc_id").as("idb"), col("sig").as("sb")),
        col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long")
          .as("ham"))
    val banded = graft.operators.ImageHash.dhashPairs(d, maxHamming = 60)
      .select(col("ida"), col("idb"), lit(true).as("banded"))
    truth.join(banded, Seq("ida", "idb"), "left")
      .select(col("ham"), coalesce(col("banded"), lit(false))
        .as("banded"))
      .crossJoin(broadcast(Seq(6L, 10L, 14L).toDF("t")))
      .groupBy("t")
      .agg(sum(when(col("ham") <= col("t"), 1L).otherwise(0L))
          .as("n_truth"),
        sum(when(col("banded") && col("ham") <= col("t"), 1L)
          .otherwise(0L)).as("n_pred"))
      .select(col("t"), col("n_truth"), col("n_pred"),
        (col("n_truth") - col("n_pred")).as("fn"),
        when(col("n_truth") === 0, lit(1.0)).otherwise(
          round(col("n_pred").cast("double")
            / col("n_truth").cast("double"), 4)).as("recall"))
  }

  /** CSV (RFC 4180) roundtrip — the sibling of the JSONL row for the
    * other interchange format corpora still arrive in: each doc
    * serialized as one to_csv record (QUOTING is what's under test —
    * embedded commas, double-quote doubling, newline-bearing fields get
    * quoted), re-parsed with from_csv against an explicit schema.
    * Row-local both directions; the oracle derives the expected parse
    * output and quoting DECISION independently (a field needs quotes
    * iff it contains comma, quote or newline). */
  def qCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType)))
    // every 4th doc gets a planted comma+quote+newline prefix — the
    // corpus text is hazard-free, and an untested quoting path is no
    // roundtrip proof at all (the unicode/deflate planting move)
    val hazard = when(col("doc_id") % 4 === 0, lit("a,\"b\"\n"))
      .otherwise(lit(""))
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        col("text"))
      .select(col("doc_id"), col("lang"),
        concat(hazard, col("text")).as("text"))
    // escape = quote char: RFC 4180 quote-doubling, not backslashes
    import scala.jdk.CollectionConverters._
    val rfc = Map("escape" -> "\"")
    val line = to_csv(struct(col("doc_id"), col("lang"), col("text")),
      rfc.asJava)
    val p = from_csv(col("line"), schema, rfc)
    d.select(col("doc_id"), col("text").as("orig"), line.as("line"))
      .select(col("doc_id"), col("orig"), col("line"), p.as("p"))
      .select(col("doc_id"),
        col("p.lang").as("lang"),
        length(col("p.text")).cast("long").as("n_chars"),
        // the quoting decision itself, recomputed from the emitted line:
        // a quoted text field starts right after "id,lang," with a quote
        (substring(col("line"),
          (length(col("doc_id").cast("string")) + length(col("p.lang"))
            + 3).cast("int"), lit(1)) === "\"").as("text_quoted"),
        coalesce(col("p.text") === col("orig"), lit(false))
          .as("roundtrip"))
  }

  /** ORC source roundtrip — the other columnar interchange format a
    * lakehouse meets (Hive-era warehouses still hand ORC over): the
    * corpus is written ONCE per session as zlib ORC, PARTITIONED BY
    * lang, and read back through a pruned scan — the lang predicate
    * resolves at the directory level (partition pruning) and the
    * n_chars predicate pushes into the ORC reader (PushedFilters;
    * PlanShapeSpec pins both). The roundtrip contract is value-level:
    * md5 over the read-back text must equal the oracle's md5 straight
    * off parquet — a lossy writer, a schema coercion or an encoding
    * detour would all hash apart. Write is idempotent per session
    * (the writeBucketedOnce policy); the read is map-only. */
  def qOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tag = (dir + "_" + spark.sparkContext.applicationId)
      .replaceAll("[^A-Za-z0-9]", "_")
    val path = s"/tmp/graft_orc/$tag"
    graft.sources.Bucketed.cleanupOnExit(path)
    if (!new java.io.File(path).exists()) {
      Tables.load(spark, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"), col("source"),
          col("text"), col("n_chars").cast("long").as("n_chars"),
          col("lang"))
        .write.mode("overwrite").option("compression", "zlib")
        .partitionBy("lang").orc(path)
    }
    spark.read.orc(path)
      .filter(col("lang").isin("en", "de") && col("n_chars") >= 100)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        md5(col("text")).as("text_md5"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_orc_roundtrip" -> (qOrcRoundtrip _),
    "q_csv_roundtrip" -> (qCsvRoundtrip _),
    "q_jsonl_roundtrip" -> (qJsonlRoundtrip _),
    "q_deflate_roundtrip" -> (qDeflateRoundtrip _),
    "q_warc_ingest" -> (qWarcIngest _),
    "q_crs_distance" -> (qCrsDistance _),
    "q_read_wkt" -> (qReadWkt _),
    "q_read_wkt_multipolygon" -> (qReadWktMultiPolygon _),
    "q_read_wkb" -> (qReadWkb _),
    "q_read_geojson" -> (qReadGeojson _),
    "q_read_geojson_kinds" -> (qReadGeojsonKinds _),
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_multimodal" -> (qMultimodal _),
    "q_multimodal_wav" -> (qMultimodalWav _),
    "q_multimodal_bmp" -> (qMultimodalBmp _),
    "q_multimodal_exif" -> (qMultimodalExif _),
    "q_multimodal_jpeg_exif" -> (qMultimodalJpegExif _),
    "q_audio_resample" -> (qAudioResample _),
    "q_multimodal_video" -> (qMultimodalVideo _),
    "q_video_keyframes" -> (qVideoKeyframes _),
    "q_multimodal_mp4" -> (qMultimodalMp4 _),
    "q_multimodal_mp3" -> (qMultimodalMp3 _),
    "q_multimodal_mp3_spectral" -> (qMultimodalMp3Spectral _),
    "q_multimodal_mp3_pcm" -> (qMultimodalMp3Pcm _),
    "q_multimodal_h264" -> (qMultimodalH264 _),
    "q_multimodal_h264_mb" -> (qMultimodalH264Mb _),
    "q_multimodal_h264_ac" -> (qMultimodalH264Ac _),
    "q_multimodal_h264_cbp" -> (qMultimodalH264Cbp _),
    "q_multimodal_pdf" -> (qMultimodalPdf _),
    "q_multimodal_pdf_xrefstream" -> (qMultimodalPdfXrefstream _),
    "q_multimodal_pdf_incremental" -> (qMultimodalPdfIncremental _),
    "q_format_sniff" -> (qFormatSniff _),
    "q_multimodal_tiff_pages" -> (qMultimodalTiffPages _),
    "q_image_phash" -> (qImagePhash _),
    "q_image_hash_eval" -> (qImageHashEval _),
    "q_multimodal_audio_frames" -> (qMultimodalAudioFrames _),
    "q_audio_vad_segments" -> (qAudioVadSegments _),
    "q_audio_fingerprint" -> (qAudioFingerprint _),
    "q_multimodal_augment" -> (qMultimodalAugment _),
    "q_multimodal_png" -> (qMultimodalPng _),
    "q_multimodal_jpeg" -> (qMultimodalJpeg _),
    "q_multimodal_jpeg420" -> (qMultimodalJpeg420 _))

  /** Shared dHash CTE chain: analytic pixels → luma grid → 60-bit
    * signature (`sg`) → band buckets → candidate pairs (`pr`). Used by
    * the phash oracle (full corpus) and the banding-recall eval
    * (parameterized to the bounded eval slice — the minhashBandCtesOn
    * move). */
  private[queries] def imageSigCtesOn(base: String): String =
    s"d AS ($base),\n" +
    """gp AS (SELECT doc_id, img % 100 AS gk,
      |         8 + (img % 100) % 9 AS w,
      |         8 + (img % 100) % 5 AS h,
      |         img % 4 AS m, img FROM d),
      |co AS (SELECT doc_id, gk, w, h, m, img, x, y,
      |         (x * w) // 11 AS sx, (y * h) // 6 AS sy
      |       FROM gp,
      |       LATERAL (SELECT unnest(generate_series(0, 10)) AS x) xs,
      |       LATERAL (SELECT unnest(generate_series(0, 5)) AS y) ys),
      |bp AS (SELECT doc_id, x, y, gk, sx, sy,
      |         CASE WHEN len(list_filter(range(0, m), j ->
      |             (img * 13 + j * 7) % w = sx
      |             AND (img * 17 + j * 11) % h = sy)) > 0
      |           THEN 40 ELSE 0 END AS bump
      |       FROM co),
      |px AS (SELECT doc_id, x, y,
      |         (299 * (40 + (gk * 3 + sx * 29 + sy * 23) % 170 + bump)
      |        + 587 * (40 + (gk * 11 + sx * 17 + sy * 5) % 170 + bump)
      |        + 114 * (40 + (gk * 7 + sx * 13 + sy * 31) % 170 + bump))
      |          // 1000 AS g
      |       FROM bp),
      |sg AS (SELECT a.doc_id,
      |         CAST(COALESCE(SUM(CASE WHEN b.g > a.g
      |           THEN 1::BIGINT << CAST(a.y * 10 + a.x AS INT)
      |           ELSE 0 END), 0) AS BIGINT) AS sig
      |       FROM px a JOIN px b ON a.doc_id = b.doc_id
      |         AND b.y = a.y AND b.x = a.x + 1
      |       WHERE a.x < 10
      |       GROUP BY a.doc_id),
      |bd AS (SELECT doc_id, sig, j AS band,
      |         (sig >> (j * 15)) & 32767 AS bv
      |       FROM sg, (SELECT unnest([0, 1, 2, 3]) AS j) js),
      |pr AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb,
      |         a.sig AS siga, b.sig AS sigb
      |       FROM bd a JOIN bd b ON a.band = b.band AND a.bv = b.bv
      |         AND a.doc_id < b.doc_id)""".stripMargin

  private val imageSigCtes: String = imageSigCtesOn(
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, " +
      "CAST(doc_id AS BIGINT) AS img FROM documents")

  /** The eval's bounded base: top-2000 docs by multiplicative hash —
    * same slice the engine takes, so truth stays O(cap²) at any sf. */
  private val imageEvalBase: String =
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, " +
      "CAST(doc_id AS BIGINT) AS img FROM documents " +
      "ORDER BY (CAST(doc_id AS BIGINT) * 2654435761) % 1000000007, " +
      "doc_id LIMIT 2000"

  /** H.264 macroblock oracle: every CAVLC-decoded value derived from
    * the generator's (doc_id, mb index) arithmetic, the spec DC
    * reconstruction (Hadamard, LevelScale requantization, (dc+32)>>6
    * inverse core, Clip1) replayed per 4x4 block, and the left-only
    * DC-prediction chain UNROLLED over mbx 0..9 (the Lloyd/GD CTE
    * unroll move; widthMbs <= 10). DuckDB's `>>` is arithmetic on
    * negatives, matching the engine's Scala `>>`. */
  private lazy val h264MbOracle: String = {
    def clip(e: String) = s"LEAST(GREATEST($e, 0), 255)"
    def step(k: Int): String = {
      val pred = if (k == 0) "128"
        else s"(4 * p.rc_sum + 8) >> 4"
      val join = if (k == 0) ""
        else s" JOIN s${k - 1} p ON p.d = b.d AND p.mby = b.mby"
      s"""s$k AS (SELECT b.d, b.mby, $pred AS pred,
         |  SUM(${clip(s"($pred) + b.res")}) AS recon_sum,
         |  SUM(CASE WHEN b.bj = 3
         |      THEN ${clip(s"($pred) + b.res")} ELSE 0 END) AS rc_sum
         |  FROM blk b$join WHERE b.mbx = $k
         |  GROUP BY 1, 2, 3)""".stripMargin
    }
    val steps = (0 to 9).map(step).mkString(",\n")
    val union = (0 to 9).map(k =>
      s"SELECT CAST($k AS BIGINT) AS mbx, * FROM s$k")
      .mkString("\nUNION ALL ")
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
       |pp AS (SELECT d, 2 + d % 9 AS w, 2 + d % 5 AS h,
       |         20 + d % 16 AS qp FROM d),
       |mb AS (SELECT d, qp, mby, mbx, mby * w + mbx AS idx
       |       FROM pp,
       |       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS mby) uy,
       |       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS mbx) ux),
       |at AS (SELECT d, mby, mbx, qp,
       |        CASE WHEN (d + idx) % 5 = 0 THEN 0 ELSE 1 END AS tc,
       |        CASE WHEN (d + idx) % 5 = 0 THEN 0
       |             ELSE (d + idx * 7) % 16 END AS pos,
       |        (d + idx * 3) % 24 AS base,
       |        CASE WHEN (d + idx) % 2 = 0 THEN 1 ELSE -1 END AS sgn
       |      FROM mb),
       |lv AS (SELECT d, mby, mbx, qp, tc, pos,
       |        CASE WHEN tc = 0 THEN 0
       |             WHEN base % 4 = 0 THEN sgn
       |             ELSE sgn * (2 + base * 3) END AS lvl
       |      FROM at),
       |nc AS (SELECT a.*, CASE WHEN a.mbx = 0 THEN 0 ELSE l.tc END AS n_c
       |       FROM lv a LEFT JOIN lv l ON l.d = a.d AND l.mby = a.mby
       |         AND l.mbx = a.mbx - 1),
       |zz AS (SELECT * FROM (VALUES (0,0,0),(1,0,1),(2,1,0),(3,2,0),
       |        (4,1,1),(5,0,2),(6,0,3),(7,1,2),(8,2,1),(9,3,0),(10,3,1),
       |        (11,2,2),(12,1,3),(13,2,3),(14,3,2),(15,3,3))
       |        v(p, pr, pc)),
       |hm AS (SELECT * FROM (VALUES (0,0,1),(0,1,1),(0,2,1),(0,3,1),
       |        (1,0,1),(1,1,1),(1,2,-1),(1,3,-1),
       |        (2,0,1),(2,1,-1),(2,2,-1),(2,3,1),
       |        (3,0,1),(3,1,-1),(3,2,1),(3,3,-1)) v(i, k, v)),
       |ls AS (SELECT * FROM (VALUES (0,10),(1,11),(2,13),(3,14),(4,16),
       |        (5,18)) v(m, a)),
       |blk AS (SELECT n.d, n.mby, n.mbx, h1.i AS bi, h2.i AS bj,
       |         ((((n.lvl * h1.v * h2.v) * ls.a
       |             + (CAST(1 AS BIGINT) << (5 - n.qp // 6)))
       |           >> (6 - n.qp // 6)) + 32) >> 6 AS res
       |       FROM nc n
       |       JOIN zz ON zz.p = n.pos
       |       JOIN hm h1 ON h1.k = zz.pr
       |       JOIN hm h2 ON h2.k = zz.pc
       |       JOIN ls ON ls.m = n.qp % 6),
       |$steps,
       |u AS ($union)
       |SELECT u.d AS doc_id, u.mbx, u.mby,
       |  CAST(n.tc AS BIGINT) AS tc, CAST(n.lvl AS BIGINT) AS lvl,
       |  CAST(n.pos AS BIGINT) AS pos, CAST(n.n_c AS BIGINT) AS n_c,
       |  CAST(u.pred AS BIGINT) AS pred,
       |  CAST(u.recon_sum AS BIGINT) AS recon_sum,
       |  CAST(u.rc_sum AS BIGINT) AS rc_sum
       |FROM u JOIN nc n ON n.d = u.d AND n.mby = u.mby
       |  AND n.mbx = u.mbx""".stripMargin
  }

  /** Multi-coefficient H.264 oracle: the coefficient SET (positions,
    * levels, TrailingOnes, total_zeros) re-derived from the generator's
    * (doc_id, mb, k) arithmetic, the multi-coefficient Hadamard
    * reconstruction replayed cell by cell (f_ij = Σ_k lvl_k·H[i][pr_k]
    * ·H[j][pc_k], then requant + (dc+32)>>6 + Clip1), and the left-only
    * prediction chain unrolled over mbx 0..9 like the single-coefficient
    * oracle. The engine must recover exactly these values THROUGH the
    * real CAVLC bitstream. */
  private lazy val h264AcOracle: String = {
    def clip(e: String) = s"LEAST(GREATEST($e, 0), 255)"
    def step(k: Int): String = {
      val pred = if (k == 0) "128"
        else s"(4 * p.rc_sum + 8) >> 4"
      val join = if (k == 0) ""
        else s" JOIN s${k - 1} p ON p.d = b.d AND p.mby = b.mby"
      s"""s$k AS (SELECT b.d, b.mby, $pred AS pred,
         |  SUM(${clip(s"($pred) + b.res")}) AS recon_sum,
         |  SUM(CASE WHEN b.bj = 3
         |      THEN ${clip(s"($pred) + b.res")} ELSE 0 END) AS rc_sum
         |  FROM blk b$join WHERE b.mbx = $k
         |  GROUP BY 1, 2, 3)""".stripMargin
    }
    val steps = (0 to 9).map(step).mkString(",\n")
    val union = (0 to 9).map(k =>
      s"SELECT CAST($k AS BIGINT) AS mbx, * FROM s$k")
      .mkString("\nUNION ALL ")
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
       |pp AS (SELECT d, 2 + d % 9 AS w, 2 + d % 5 AS h,
       |         20 + d % 16 AS qp FROM d),
       |mb AS (SELECT d, qp, mby, mbx, mby * w + mbx AS idx
       |       FROM pp,
       |       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS mby) uy,
       |       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS mbx) ux),
       |co AS (SELECT m.d, m.mby, m.mbx, m.qp,
       |         ((m.d + m.idx * 7) % 6)
       |           + kk.k * (1 + (m.d + m.idx) % 5) AS pos,
       |         (CASE WHEN (m.d + m.idx + kk.k) % 2 = 0
       |               THEN 1 ELSE -1 END)
       |         * (CASE WHEN kk.k >= (m.d + m.idx) % 4
       |                   - (m.d + m.idx * 5) % ((m.d + m.idx) % 4 + 1)
       |                 THEN 1
       |                 ELSE 2 + (m.d + m.idx * 3 + kk.k * 11) % 24 END)
       |           AS lvl
       |       FROM mb m, (SELECT unnest([0, 1, 2]) AS k) kk
       |       WHERE kk.k < (m.d + m.idx) % 4),
       |ag AS (SELECT d, mby, mbx, COUNT(*) AS tc, SUM(lvl) AS lvl_sum,
       |         SUM(pos) AS pos_sum,
       |         MAX(pos) + 1 - COUNT(*) AS tzeros,
       |         MAX(CASE WHEN rn = 1 THEN abs(lvl) END) AS m1,
       |         MAX(CASE WHEN rn = 2 THEN abs(lvl) END) AS m2,
       |         MAX(CASE WHEN rn = 3 THEN abs(lvl) END) AS m3
       |       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY d, mby,
       |               mbx ORDER BY pos DESC) AS rn FROM co) z
       |       GROUP BY 1, 2, 3),
       |t1 AS (SELECT d, mby, mbx, tc, lvl_sum, pos_sum, tzeros,
       |         CASE WHEN m1 = 1 THEN
       |           CASE WHEN m2 = 1 THEN
       |             CASE WHEN m3 = 1 THEN 3 ELSE 2 END
       |           ELSE 1 END
       |         ELSE 0 END AS t1s
       |       FROM ag),
       |am AS (SELECT m.d, m.mby, m.mbx, m.qp,
       |         COALESCE(t.tc, 0) AS tc, COALESCE(t.t1s, 0) AS t1s,
       |         COALESCE(t.tzeros, 0) AS tzeros,
       |         COALESCE(t.lvl_sum, 0) AS lvl_sum,
       |         COALESCE(t.pos_sum, 0) AS pos_sum
       |       FROM mb m LEFT JOIN t1 t ON t.d = m.d AND t.mby = m.mby
       |         AND t.mbx = m.mbx),
       |nc AS (SELECT a.*, CASE WHEN a.mbx = 0 THEN 0 ELSE l.tc END AS n_c
       |       FROM am a LEFT JOIN am l ON l.d = a.d AND l.mby = a.mby
       |         AND l.mbx = a.mbx - 1),
       |zz AS (SELECT * FROM (VALUES (0,0,0),(1,0,1),(2,1,0),(3,2,0),
       |        (4,1,1),(5,0,2),(6,0,3),(7,1,2),(8,2,1),(9,3,0),(10,3,1),
       |        (11,2,2),(12,1,3),(13,2,3),(14,3,2),(15,3,3))
       |        v(p, pr, pc)),
       |hm AS (SELECT * FROM (VALUES (0,0,1),(0,1,1),(0,2,1),(0,3,1),
       |        (1,0,1),(1,1,1),(1,2,-1),(1,3,-1),
       |        (2,0,1),(2,1,-1),(2,2,-1),(2,3,1),
       |        (3,0,1),(3,1,-1),(3,2,1),(3,3,-1)) v(i, k, v)),
       |ls AS (SELECT * FROM (VALUES (0,10),(1,11),(2,13),(3,14),(4,16),
       |        (5,18)) v(m, a)),
       |fc AS (SELECT c.d, c.mby, c.mbx, h1.i AS bi, h2.i AS bj,
       |         SUM(c.lvl * h1.v * h2.v) AS f
       |       FROM co c
       |       JOIN zz ON zz.p = c.pos
       |       JOIN hm h1 ON h1.k = zz.pr
       |       JOIN hm h2 ON h2.k = zz.pc
       |       GROUP BY 1, 2, 3, 4, 5),
       |cg AS (SELECT m.d, m.mby, m.mbx, m.qp, ii.i AS bi, jj.i AS bj
       |       FROM mb m, (SELECT unnest([0, 1, 2, 3]) AS i) ii,
       |            (SELECT unnest([0, 1, 2, 3]) AS i) jj),
       |blk AS (SELECT g.d, g.mby, g.mbx, g.bi, g.bj,
       |         ((((COALESCE(f.f, 0) * ls.a
       |             + (CAST(1 AS BIGINT) << (5 - g.qp // 6)))
       |           >> (6 - g.qp // 6)) + 32) >> 6) AS res
       |       FROM cg g
       |       LEFT JOIN fc f ON f.d = g.d AND f.mby = g.mby
       |         AND f.mbx = g.mbx AND f.bi = g.bi AND f.bj = g.bj
       |       JOIN ls ON ls.m = g.qp % 6),
       |$steps,
       |u AS ($union)
       |SELECT u.d AS doc_id, u.mbx, u.mby,
       |  CAST(n.tc AS BIGINT) AS tc, CAST(n.t1s AS BIGINT) AS t1s,
       |  CAST(n.tzeros AS BIGINT) AS tzeros,
       |  CAST(n.n_c AS BIGINT) AS n_c,
       |  CAST(n.lvl_sum AS BIGINT) AS lvl_sum,
       |  CAST(n.pos_sum AS BIGINT) AS pos_sum,
       |  CAST(u.pred AS BIGINT) AS pred,
       |  CAST(u.recon_sum AS BIGINT) AS recon_sum,
       |  CAST(u.rc_sum AS BIGINT) AS rc_sum
       |FROM u JOIN nc n ON n.d = u.d AND n.mby = u.mby
       |  AND n.mbx = u.mbx""".stripMargin
  }

  /** CBP luma-15 oracle: the full I_16x16 residual assembly replayed —
    * analytic DC + AC coefficient sets, the 8.5.10 DC Hadamard/scale,
    * both 8.5.12.1 AC requantization branches via a normAdjust VALUES
    * table, the 8.5.12.2 integer butterfly UNROLLED as wide-column
    * expressions (rows then columns, >>1 on intermediates — NOT a
    * matrix multiply, so the two passes are generated inline), and the
    * left-only DC prediction chain stepped over mbx 0..9. dc_nc
    * simplifies analytically: the left MB's blk(3,0) AC TotalCoeff is
    * (d + idx + 9) % 3 for mbx > 0. */
  private lazy val h264CbpOracle: String = {
    def clip(e: String) = s"LEAST(GREATEST($e, 0), 255)"
    // row butterfly: f_{i j} from d_{i 0..3}; col butterfly + (g+32)>>6
    def fCols: String = (0 to 3).map { i =>
      val (d0, d1, d2, d3) = (s"d${i}0", s"d${i}1", s"d${i}2", s"d${i}3")
      Seq(
        s"(($d0 + $d2) + ($d1 + ($d3 >> 1))) AS f${i}0",
        s"(($d0 - $d2) + (($d1 >> 1) - $d3)) AS f${i}1",
        s"(($d0 - $d2) - (($d1 >> 1) - $d3)) AS f${i}2",
        s"(($d0 + $d2) - ($d1 + ($d3 >> 1))) AS f${i}3").mkString(",\n  ")
    }.mkString(",\n  ")
    def rCols: String = (0 to 3).map { j =>
      val (f0, f1, f2, f3) = (s"f0$j", s"f1$j", s"f2$j", s"f3$j")
      Seq(
        s"(((($f0 + $f2) + ($f1 + ($f3 >> 1))) + 32) >> 6) AS r0$j",
        s"(((($f0 - $f2) + (($f1 >> 1) - $f3)) + 32) >> 6) AS r1$j",
        s"(((($f0 - $f2) - (($f1 >> 1) - $f3)) + 32) >> 6) AS r2$j",
        s"(((($f0 + $f2) - ($f1 + ($f3 >> 1))) + 32) >> 6) AS r3$j")
        .mkString(",\n  ")
    }.mkString(",\n  ")
    val dCols = (for (i <- 0 to 3; j <- 0 to 3) yield
      s"COALESCE(SUM(CASE WHEN a.zr = $i AND a.zc = $j THEN a.dv END), 0)" +
        s" + CASE WHEN $i = 0 AND $j = 0" +
        s" THEN MAX(COALESCE(y.dcy, 0)) ELSE 0 END AS d$i$j")
      .mkString(",\n  ")
    val resCase = (for (i <- 0 to 3; j <- 0 to 3) yield
      s"WHEN ${4 * i + j} THEN r$i$j").mkString(" ")
    def step(k: Int): String = {
      val pred = if (k == 0) "128" else "(p.rc_sum + 8) >> 4"
      val join = if (k == 0) ""
        else s" JOIN s${k - 1} p ON p.d = b.d AND p.mby = b.mby"
      s"""s$k AS (SELECT b.d, b.mby, $pred AS pred,
         |  SUM(${clip(s"($pred) + b.res")}) AS recon_sum,
         |  SUM(CASE WHEN b.x = 15
         |      THEN ${clip(s"($pred) + b.res")} ELSE 0 END) AS rc_sum,
         |  SUM((b.y * 16 + b.x + 1) * ${clip(s"($pred) + b.res")})
         |    AS wsum
         |  FROM pix b$join WHERE b.mbx = $k
         |  GROUP BY 1, 2, 3)""".stripMargin
    }
    val steps = (0 to 9).map(step).mkString(",\n")
    val union = (0 to 9).map(k =>
      s"SELECT CAST($k AS BIGINT) AS mbx, * FROM s$k")
      .mkString("\nUNION ALL ")
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
       |pp AS (SELECT d, 2 + d % 9 AS w, 2 + d % 5 AS h,
       |         20 + d % 16 AS qp FROM d),
       |mb AS (SELECT d, qp, mby, mbx, mby * w + mbx AS idx
       |       FROM pp,
       |       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS mby) uy,
       |       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS mbx) ux),
       |zz AS (SELECT * FROM (VALUES (0,0,0),(1,0,1),(2,1,0),(3,2,0),
       |        (4,1,1),(5,0,2),(6,0,3),(7,1,2),(8,2,1),(9,3,0),(10,3,1),
       |        (11,2,2),(12,1,3),(13,2,3),(14,3,2),(15,3,3))
       |        v(p, pr, pc)),
       |hm AS (SELECT * FROM (VALUES (0,0,1),(0,1,1),(0,2,1),(0,3,1),
       |        (1,0,1),(1,1,1),(1,2,-1),(1,3,-1),
       |        (2,0,1),(2,1,-1),(2,2,-1),(2,3,1),
       |        (3,0,1),(3,1,-1),(3,2,1),(3,3,-1)) v(i, k, v)),
       |na AS (SELECT * FROM (VALUES (0,0,10),(0,1,16),(0,2,13),
       |        (1,0,11),(1,1,18),(1,2,14),(2,0,13),(2,1,20),(2,2,16),
       |        (3,0,14),(3,1,23),(3,2,18),(4,0,16),(4,1,25),(4,2,20),
       |        (5,0,18),(5,1,29),(5,2,23)) v(m, cls, a)),
       |bm AS (SELECT * FROM (VALUES (0,0,0),(1,1,0),(2,0,1),(3,1,1),
       |        (4,2,0),(5,3,0),(6,2,1),(7,3,1),(8,0,2),(9,1,2),
       |        (10,0,3),(11,1,3),(12,2,2),(13,3,2),(14,2,3),(15,3,3))
       |        v(blk, bx, by)),
       |dcc AS (SELECT m.d, m.mby, m.mbx, m.qp,
       |         ((m.d + m.idx * 7) % 6)
       |           + kk.k * (1 + (m.d + m.idx) % 5) AS pos,
       |         (CASE WHEN (m.d + m.idx + kk.k) % 2 = 0
       |               THEN 1 ELSE -1 END)
       |         * (CASE WHEN kk.k >= (m.d + m.idx) % 4
       |                   - (m.d + m.idx * 5) % ((m.d + m.idx) % 4 + 1)
       |                 THEN 1
       |                 ELSE 2 + (m.d + m.idx * 3 + kk.k * 11) % 24 END)
       |           AS lvl
       |       FROM mb m, (SELECT unnest([0, 1, 2]) AS k) kk
       |       WHERE kk.k < (m.d + m.idx) % 4),
       |dcf AS (SELECT c.d, c.mby, c.mbx, h1.i AS bi, h2.i AS bj,
       |         SUM(c.lvl * h1.v * h2.v) AS f
       |       FROM dcc c
       |       JOIN zz ON zz.p = c.pos
       |       JOIN hm h1 ON h1.k = zz.pr
       |       JOIN hm h2 ON h2.k = zz.pc
       |       GROUP BY 1, 2, 3, 4, 5),
       |dcy AS (SELECT m.d, m.mby, m.mbx, g.bi, g.bj,
       |         ((COALESCE(f.f, 0) * n0.a
       |             + (CAST(1 AS BIGINT) << (5 - m.qp // 6)))
       |           >> (6 - m.qp // 6)) AS dcy
       |       FROM mb m
       |       JOIN na n0 ON n0.m = m.qp % 6 AND n0.cls = 0
       |       CROSS JOIN (SELECT h1.i AS bi, h2.i AS bj FROM
       |         (SELECT DISTINCT i FROM hm) h1,
       |         (SELECT DISTINCT i FROM hm) h2) g
       |       LEFT JOIN dcf f ON f.d = m.d AND f.mby = m.mby
       |         AND f.mbx = m.mbx AND f.bi = g.bi AND f.bj = g.bj),
       |acc AS (SELECT m.d, m.mby, m.mbx, m.qp, b.blk, b.bx, b.by,
       |         zz.pr AS zr, zz.pc AS zc,
       |         (CASE WHEN (m.d + m.idx + b.blk + kk.k) % 2 = 0
       |               THEN 1 ELSE -1 END)
       |         * (CASE WHEN kk.k >= (m.d + m.idx + 2 * b.blk) % 3
       |                   - (m.d + m.idx + 7 * b.blk)
       |                     % ((m.d + m.idx + 2 * b.blk) % 3 + 1)
       |                 THEN 1
       |                 ELSE 2 + (m.d + m.idx + b.blk * 5 + kk.k * 3) % 12
       |            END) AS lvl
       |       FROM mb m, bm b, (SELECT unnest([0, 1]) AS k) kk,
       |            zz
       |       WHERE kk.k < (m.d + m.idx + 2 * b.blk) % 3
       |         AND zz.p = 1 + ((m.d + m.idx * 11 + b.blk * 3) % 5)
       |           + kk.k * (1 + (m.d + b.blk) % 4)),
       |acd AS (SELECT a.d, a.mby, a.mbx, a.bx, a.by, a.zr, a.zc,
       |         CASE WHEN a.qp >= 24
       |           THEN (a.lvl * n1.a)
       |             * (CAST(1 AS BIGINT) << (a.qp // 6 - 4))
       |           ELSE (a.lvl * n1.a
       |             + (CAST(1 AS BIGINT) << (3 - a.qp // 6)))
       |             >> (4 - a.qp // 6) END AS dv
       |       FROM acc a
       |       JOIN na n1 ON n1.m = a.qp % 6 AND n1.cls =
       |         CASE WHEN a.zr % 2 = 0 AND a.zc % 2 = 0 THEN 0
       |              WHEN a.zr % 2 = 1 AND a.zc % 2 = 1 THEN 1
       |              ELSE 2 END),
       |dmat AS (SELECT m.d, m.mby, m.mbx, b.bx, b.by,
       |  $dCols
       |  FROM mb m CROSS JOIN bm b
       |  LEFT JOIN acd a ON a.d = m.d AND a.mby = m.mby
       |    AND a.mbx = m.mbx AND a.bx = b.bx AND a.by = b.by
       |  LEFT JOIN dcy y ON y.d = m.d AND y.mby = m.mby
       |    AND y.mbx = m.mbx AND y.bi = b.by AND y.bj = b.bx
       |  GROUP BY 1, 2, 3, 4, 5),
       |fpass AS (SELECT d, mby, mbx, bx, by,
       |  $fCols
       |  FROM dmat),
       |rmat AS (SELECT d, mby, mbx, bx, by,
       |  $rCols
       |  FROM fpass),
       |pix AS (SELECT r.d, r.mby, r.mbx,
       |         4 * r.bx + pj.j AS x, 4 * r.by + pi.i AS y,
       |         CASE pi.i * 4 + pj.j $resCase END AS res
       |       FROM rmat r,
       |       (SELECT unnest([0, 1, 2, 3]) AS i) pi,
       |       (SELECT unnest([0, 1, 2, 3]) AS j) pj),
       |$steps,
       |u AS ($union),
       |agg AS (SELECT m.d, m.mby, m.mbx,
       |         (m.d + m.idx) % 4 AS dc_tc,
       |         CASE WHEN m.mbx = 0 THEN 0
       |              ELSE (m.d + m.idx + 9) % 3 END AS dc_nc,
       |         SUM((m.d + m.idx + 2 * b.blk) % 3) AS ac_tc_sum,
       |         SUM(CASE WHEN (m.d + m.idx + 2 * b.blk) % 3 > 0
       |             THEN 1 ELSE 0 END) AS ac_nz_blocks
       |       FROM mb m, bm b GROUP BY 1, 2, 3, 4, 5)
       |SELECT u.d AS doc_id, u.mbx, u.mby,
       |  CAST(g.dc_tc AS BIGINT) AS dc_tc,
       |  CAST(g.dc_nc AS BIGINT) AS dc_nc,
       |  CAST(g.ac_tc_sum AS BIGINT) AS ac_tc_sum,
       |  CAST(g.ac_nz_blocks AS BIGINT) AS ac_nz_blocks,
       |  CAST(u.pred AS BIGINT) AS pred,
       |  CAST(u.recon_sum AS BIGINT) AS recon_sum,
       |  CAST(u.rc_sum AS BIGINT) AS rc_sum,
       |  CAST(u.wsum AS BIGINT) AS wsum
       |FROM u JOIN agg g ON g.d = u.d AND g.mby = u.mby
       |  AND g.mbx = u.mbx""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // the codec contract: every field re-derived analytically from the
    // same doc_id arithmetic the synthesizer used
    "q_multimodal_exif" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END
        |    AS byte_order,
        |  CAST(640 + (doc_id % 7) * 80 AS BIGINT) AS width,
        |  CAST(480 + (doc_id % 5) * 60 AS BIGINT) AS height,
        |  CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
        |  'cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
        |  CAST(1 + doc_id % 28 AS BIGINT) AS datetime_day,
        |  CAST(100 * (1 + doc_id % 7) AS BIGINT) AS iso,
        |  CAST((28 + doc_id % 10) * 10 // 10 AS BIGINT) AS fnum_x10
        |FROM documents""".stripMargin,

    // the resample arithmetic replayed sample-for-sample: same pcm
    // formula, same +32768 shift so // (floor) == the JVM's positive
    // truncating division
    "q_audio_resample" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |             CAST(256 + doc_id % 256 AS BIGINT) AS n
        |           FROM documents),
        |xin AS (SELECT doc_id, n, i,
        |          (doc_id * 31 + i * 17) % 2003 - 1001 AS x
        |        FROM d, LATERAL (SELECT unnest(generate_series(0,
        |          CAST(n - 1 AS INT))) AS i) u),
        |ain AS (SELECT doc_id, SUM(ABS(x)) AS sum_abs_in
        |        FROM xin GROUP BY 1),
        |yout AS (SELECT o.doc_id, o.j,
        |           ((xa.x + 32768) * (3 - o.p % 3)
        |            + (COALESCE(xb.x, xa.x) + 32768) * (o.p % 3)) // 3
        |            - 32768 AS y
        |         FROM (SELECT doc_id, n, j, j * 4 AS p
        |               FROM d, LATERAL (SELECT unnest(generate_series(0,
        |                 CAST(n * 3 // 4 - 1 AS INT))) AS j) u) o
        |         JOIN xin xa ON xa.doc_id = o.doc_id
        |           AND xa.i = o.p // 3
        |         LEFT JOIN xin xb ON xb.doc_id = o.doc_id
        |           AND xb.i = o.p // 3 + 1),
        |aout AS (SELECT doc_id, COUNT(*) AS n_out,
        |           SUM(ABS(y)) AS sum_abs_out,
        |           SUM(y * (1 + j % 5)) AS checksum_out
        |         FROM yout GROUP BY 1)
        |SELECT d.doc_id, d.n AS n_in, CAST(a2.n_out AS BIGINT) AS n_out,
        |  CAST(a1.sum_abs_in AS BIGINT) AS sum_abs_in,
        |  CAST(a2.sum_abs_out AS BIGINT) AS sum_abs_out,
        |  CAST(a2.checksum_out AS BIGINT) AS checksum_out
        |FROM d JOIN ain a1 ON d.doc_id = a1.doc_id
        |JOIN aout a2 ON d.doc_id = a2.doc_id""".stripMargin,

    // APP1 wrapper: 3 non-EOI segments by construction (APP0, APP1,
    // COM); the Exif fields are the same analytic plant
    "q_multimodal_jpeg_exif" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(3 AS BIGINT) AS n_segments,
        |  CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END
        |    AS byte_order,
        |  CAST(640 + (doc_id % 7) * 80 AS BIGINT) AS width,
        |  CAST(480 + (doc_id % 5) * 60 AS BIGINT) AS height,
        |  CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
        |  'cam' || CAST(doc_id % 5 AS VARCHAR) AS make,
        |  CAST(100 * (1 + doc_id % 7) AS BIGINT) AS iso
        |FROM documents""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |  CAST(n_chars AS BIGINT) AS n_chars, md5(text) AS text_md5
        |FROM documents
        |WHERE lang IN ('en', 'de') AND n_chars >= 100""".stripMargin,
    "q_multimodal_h264_mb" -> h264MbOracle,
    "q_multimodal_h264_ac" -> h264AcOracle,
    "q_multimodal_h264_cbp" -> h264CbpOracle,
    // PDF: every extracted field re-derived from the doc_id arithmetic
    // the synthesizer used; the text hash replays the 131-fold over the
    // line-joined extraction (compression-independent by design — the
    // deflate byte layout is verified in-file, never emitted)
    // multi-page TIFF: every field re-derived from the (doc_id, page)
    // arithmetic; the chain walk itself is engine work the totals pin
    "q_multimodal_tiff_pages" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
        |pg AS (SELECT d, 1 + d % 3 AS np FROM d),
        |pp AS (SELECT pg.d, pg.np, pz.p
        |       FROM pg, LATERAL (SELECT unnest(generate_series(0,
        |         CAST(pg.np - 1 AS INT))) AS p) pz)
        |SELECT d AS doc_id, CAST(p AS BIGINT) AS page,
        |  CAST(np AS BIGINT) AS n_pages,
        |  CASE WHEN d % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
        |  CAST(640 + ((d + p) % 7) * 80 AS BIGINT) AS width,
        |  CAST(480 + ((d + p) % 5) * 60 AS BIGINT) AS height,
        |  CAST(1 + (d + p) % 8 AS BIGINT) AS orientation,
        |  'cam' || CAST(d % 5 AS VARCHAR) AS make
        |FROM pp""".stripMargin,

    // sniffing: the routing decision re-derived from the same doc_id
    // arithmetic that picked the synth; tampered docs MUST be 'unknown'
    "q_format_sniff" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
        |f AS (SELECT d,
        |        ['pdf','wav','bmp','png','jpeg','mp4','mp3','h264',
        |         'tiff'][CAST(d % 9 + 1 AS INT)] AS fmt,
        |        d % 17 = 0 AS tampered FROM d)
        |SELECT d AS doc_id, fmt AS fmt_true,
        |  CASE WHEN tampered THEN 'unknown' ELSE fmt END AS detected,
        |  tampered, NOT tampered AS is_match
        |FROM f""".stripMargin,

    "q_multimodal_pdf" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
        |pg AS (SELECT d, 1 + d % 3 AS np FROM d),
        |pp AS (SELECT pg.d, pg.np, pz.p,
        |         3 + (pg.d + pz.p) % 6 AS nl,
        |         9 + (pg.d + pz.p) % 8 AS fs,
        |         60 + (pg.d + 3 * pz.p) % 30 AS x0,
        |         700 + (pg.d + 7 * pz.p) % 50 AS y0
        |       FROM pg, LATERAL (SELECT unnest(generate_series(0,
        |         CAST(pg.np - 1 AS INT))) AS p) pz),
        |l AS (SELECT pp.d, pp.p, i.i,
        |        'doc ' || pp.d || ' page ' || pp.p || ' line ' || i.i
        |        || ' ' ||
        |        ['alpha','bravo','charlie','delta','echo','foxtrot',
        |         'golf','hotel'][CAST((pp.d + pp.p + i.i) % 8 + 1 AS INT)]
        |        || CASE WHEN (pp.d + pp.p + i.i) % 4 = 0
        |             THEN ' (ref ' || chr(92)
        |               || CAST((pp.d + i.i) % 9 AS VARCHAR) || ')'
        |             ELSE '' END
        |          AS t
        |      FROM pp, LATERAL (SELECT unnest(generate_series(0,
        |        CAST(pp.nl - 1 AS INT))) AS i) i),
        |tx AS (SELECT d, p, string_agg(t, chr(10) ORDER BY i) AS text
        |       FROM l GROUP BY 1, 2)
        |SELECT pp.d AS doc_id, CAST(pp.p AS BIGINT) AS page,
        |  CAST(3 + 2 * pp.np AS BIGINT) AS n_objs,
        |  CAST(pp.np AS BIGINT) AS n_pages,
        |  CAST(pp.nl AS BIGINT) AS n_lines,
        |  CAST(pp.fs AS BIGINT) AS font_size,
        |  CAST(len(tx.text) AS BIGINT) AS text_chars,
        |  CAST(len(tx.text) - len(replace(replace(replace(tx.text,
        |    '(', ''), ')', ''), chr(92), ''))  AS BIGINT) AS esc_chars,
        |  CAST(pp.x0 AS BIGINT) AS x0, CAST(pp.y0 AS BIGINT) AS y0,
        |  CAST(pp.y0 - (pp.nl - 1) * (pp.fs + 2) AS BIGINT) AS y_last,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(list_filter(string_split(tx.text, ''),
        |                               c -> len(c) > 0),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 131 + b) % 1000000007) AS text_hash
        |FROM pp JOIN tx ON tx.d = pp.d AND tx.p = pp.p""".stripMargin,
    // PDF 1.5 features replayed from line arithmetic: logical text per
    // line (escape stratum = tab + paren + backslash + control char
    // every 3rd (d+p+i)), pages/lines/position formulas, object counts
    // from the 1.5 layout (5+2np numbered objects, np+3 ObjStm-packed)
    "q_multimodal_pdf_xrefstream" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
        |pg AS (SELECT d, 1 + (d + 1) % 3 AS np FROM d),
        |pp AS (SELECT pg.d, pg.np, pz.p,
        |         3 + (pg.d + 2 * pz.p) % 6 AS nl,
        |         9 + (pg.d + 2 * pz.p) % 8 AS fs,
        |         55 + (pg.d + 5 * pz.p) % 40 AS x0,
        |         690 + (pg.d + 11 * pz.p) % 60 AS y0
        |       FROM pg, LATERAL (SELECT unnest(generate_series(0,
        |         CAST(pg.np - 1 AS INT))) AS p) pz),
        |l AS (SELECT pp.d, pp.p, i.i,
        |        'xdoc ' || pp.d || ' pg ' || pp.p || ' ln ' || i.i
        |        || ' ' ||
        |        ['alpha','bravo','charlie','delta','echo','foxtrot',
        |         'golf','hotel']
        |          [CAST((pp.d + 2 * pp.p + 3 * i.i) % 8 + 1 AS INT)]
        |        || CASE WHEN (pp.d + pp.p + i.i) % 3 = 0
        |             THEN chr(9) || '(' || chr(92)
        |               || chr(CAST(1 + (pp.d + i.i) % 26 AS INT)) || ')'
        |             ELSE '' END
        |          AS t,
        |        CASE WHEN (pp.d + pp.p + i.i) % 3 = 0 THEN 5 ELSE 0 END
        |          AS esc
        |      FROM pp, LATERAL (SELECT unnest(generate_series(0,
        |        CAST(pp.nl - 1 AS INT))) AS i) i),
        |tx AS (SELECT d, p, string_agg(t, chr(10) ORDER BY i) AS text,
        |         SUM(esc) AS esc
        |       FROM l GROUP BY 1, 2)
        |SELECT pp.d AS doc_id, CAST(pp.p AS BIGINT) AS page,
        |  CAST(5 + 2 * pp.np AS BIGINT) AS n_objs,
        |  CAST(pp.np AS BIGINT) AS n_pages,
        |  CAST(pp.np + 3 AS BIGINT) AS n_objstm,
        |  CAST(pp.nl AS BIGINT) AS n_lines,
        |  CAST(pp.fs AS BIGINT) AS font_size,
        |  CAST(len(tx.text) AS BIGINT) AS text_chars,
        |  CAST(tx.esc AS BIGINT) AS esc_chars,
        |  CAST(pp.x0 AS BIGINT) AS x0, CAST(pp.y0 AS BIGINT) AS y0,
        |  CAST(pp.y0 - (pp.nl - 1) * (pp.fs + 2) AS BIGINT) AS y_last,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(list_filter(string_split(tx.text, ''),
        |                               c -> len(c) > 0),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 131 + b) % 1000000007) AS text_hash
        |FROM pp JOIN tx ON tx.d = pp.d AND tx.p = pp.p""".stripMargin,
    // incremental update replayed: page 0 carries one extra revision
    // line (escape-free), n_objs grows by the new xref stream object;
    // other pages identical to the xrefstream oracle
    "q_multimodal_pdf_incremental" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS d FROM documents),
        |pg AS (SELECT d, 1 + (d + 1) % 3 AS np FROM d),
        |pp AS (SELECT pg.d, pg.np, pz.p,
        |         3 + (pg.d + 2 * pz.p) % 6
        |           + CASE WHEN pz.p = 0 THEN 1 ELSE 0 END AS nl,
        |         3 + (pg.d + 2 * pz.p) % 6 AS nl0,
        |         9 + (pg.d + 2 * pz.p) % 8 AS fs,
        |         55 + (pg.d + 5 * pz.p) % 40 AS x0,
        |         690 + (pg.d + 11 * pz.p) % 60 AS y0
        |       FROM pg, LATERAL (SELECT unnest(generate_series(0,
        |         CAST(pg.np - 1 AS INT))) AS p) pz),
        |l AS (SELECT pp.d, pp.p, i.i,
        |        CASE WHEN pp.p = 0 AND i.i = pp.nl0
        |          THEN 'rev 1 doc ' || pp.d || ' ' ||
        |            ['alpha','bravo','charlie','delta','echo','foxtrot',
        |             'golf','hotel'][CAST((pp.d + 5) % 8 + 1 AS INT)]
        |          ELSE
        |        'xdoc ' || pp.d || ' pg ' || pp.p || ' ln ' || i.i
        |        || ' ' ||
        |        ['alpha','bravo','charlie','delta','echo','foxtrot',
        |         'golf','hotel']
        |          [CAST((pp.d + 2 * pp.p + 3 * i.i) % 8 + 1 AS INT)]
        |        || CASE WHEN (pp.d + pp.p + i.i) % 3 = 0
        |             THEN chr(9) || '(' || chr(92)
        |               || chr(CAST(1 + (pp.d + i.i) % 26 AS INT)) || ')'
        |             ELSE '' END
        |        END AS t,
        |        CASE WHEN pp.p = 0 AND i.i = pp.nl0 THEN 0
        |             WHEN (pp.d + pp.p + i.i) % 3 = 0 THEN 5
        |             ELSE 0 END AS esc
        |      FROM pp, LATERAL (SELECT unnest(generate_series(0,
        |        CAST(pp.nl - 1 AS INT))) AS i) i),
        |tx AS (SELECT d, p, string_agg(t, chr(10) ORDER BY i) AS text,
        |         SUM(esc) AS esc
        |       FROM l GROUP BY 1, 2)
        |SELECT pp.d AS doc_id, CAST(pp.p AS BIGINT) AS page,
        |  CAST(6 + 2 * pp.np AS BIGINT) AS n_objs,
        |  CAST(pp.np AS BIGINT) AS n_pages,
        |  CAST(pp.np + 3 AS BIGINT) AS n_objstm,
        |  CAST(pp.nl AS BIGINT) AS n_lines,
        |  CAST(pp.fs AS BIGINT) AS font_size,
        |  CAST(len(tx.text) AS BIGINT) AS text_chars,
        |  CAST(tx.esc AS BIGINT) AS esc_chars,
        |  CAST(pp.x0 AS BIGINT) AS x0, CAST(pp.y0 AS BIGINT) AS y0,
        |  CAST(pp.y0 - (pp.nl - 1) * (pp.fs + 2) AS BIGINT) AS y_last,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(list_filter(string_split(tx.text, ''),
        |                               c -> len(c) > 0),
        |                   c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 131 + b) % 1000000007) AS text_hash
        |FROM pp JOIN tx ON tx.d = pp.d AND tx.p = pp.p""".stripMargin,
    // VAD segments replayed analytically: frame f of doc d is silence
    // iff (d + f) % 5 < 2 (the planted gate), speech energies from the
    // synth formula, islands via the same frame - row_number key
    "q_audio_vad_segments" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS dd FROM documents),
        |n AS (SELECT dd, 256 + dd % 256 AS ns FROM d),
        |fr AS (SELECT dd, f FROM n, LATERAL (SELECT
        |         unnest(generate_series(0, ns // 64 - 1)) AS f) u),
        |sp AS (SELECT dd, f,
        |         CASE WHEN (dd + f) % 5 < 2 THEN 0 ELSE (
        |           SELECT SUM(v * v) FROM (
        |             SELECT ((dd * 31 + (f * 64 + i) * 17) % 2003)
        |               - 1001 AS v
        |             FROM (SELECT unnest(generate_series(0, 63)) AS i))
        |         ) END AS energy
        |       FROM fr),
        |sf AS (SELECT dd, f, energy,
        |         f - ROW_NUMBER() OVER (PARTITION BY dd ORDER BY f)
        |           AS isl
        |       FROM sp WHERE energy > 0),
        |seg AS (SELECT dd, isl, MIN(f) AS start_frame,
        |          MAX(f) AS end_frame, COUNT(*) AS n_frames,
        |          SUM(energy) AS sum_energy
        |        FROM sf GROUP BY 1, 2)
        |SELECT dd AS doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY dd ORDER BY start_frame)
        |    AS seg_idx,
        |  start_frame, end_frame, CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(n_frames * 8 AS BIGINT) AS duration_ms,
        |  CAST(sum_energy AS BIGINT) AS sum_energy
        |FROM seg""".stripMargin,
    // landmark matching replayed end to end: analytic samples → integer
    // WHT spectrum → peak constellation (same |W| desc, k asc tie) →
    // landmark hashes → vote join → same (votes desc, track, dt) best
    "q_audio_fingerprint" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS dd FROM documents),
        |n AS (SELECT dd, 256 + dd % 256 AS ns FROM d),
        |fr AS (SELECT dd, f FROM n, LATERAL (SELECT
        |         unnest(generate_series(0, ns // 64 - 1)) AS f) u),
        |w AS (SELECT dd, f, SUM(s) AS w0,
        |        SUM(CASE WHEN (i & 32) = 0 THEN s ELSE -s END) AS w32
        |      FROM fr,
        |        LATERAL (SELECT unnest(generate_series(0, 63)) AS i) ui,
        |        LATERAL (SELECT (dd * 31 + (f * 64 + i) * 17) % 2003
        |                   - 1001 AS s) us
        |      GROUP BY 1, 2),
        |pk AS (SELECT dd, f,
        |         ((w0 + 65536) * 262144 + (w32 + 65536)) % 1000000007
        |           AS kpm FROM w),
        |lm AS (SELECT a.dd, a.f AS t, b.f - a.f AS dlt,
        |         ((a.kpm * 2654435761 + b.kpm) % 1000000007) * 4
        |           + (b.f - a.f) AS h
        |       FROM pk a JOIN pk b ON b.dd = a.dd
        |        AND b.f - a.f BETWEEN 1 AND 3),
        |q AS (SELECT dd AS qid, t - 1 AS tq, h FROM lm
        |      WHERE dd % 10 = 3 AND t >= 1 AND t + dlt <= 3),
        |v AS (SELECT q.qid, i.dd AS track, i.t - q.tq AS dt,
        |        COUNT(*) AS votes
        |      FROM q JOIN lm i ON i.h = q.h GROUP BY 1, 2, 3),
        |b AS (SELECT qid, track, dt, votes, ROW_NUMBER() OVER (
        |        PARTITION BY qid ORDER BY votes DESC, track, dt) AS rn
        |      FROM v)
        |SELECT qid, track, dt, CAST(votes AS BIGINT) AS votes,
        |  (track = qid AND dt = 1) AS hit
        |FROM b WHERE rn = 1""".stripMargin,
    // the roundtrip identity: our decode of our encode must equal the
    // original text byte-for-byte — DuckDB's md5 over the raw column is
    // an INDEPENDENT digest of the expected bytes
    "q_deflate_roundtrip" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CASE WHEN STRLEN(text) < 64 THEN 'stored'
        |       WHEN STRLEN(text) < 512 THEN 'fixed'
        |       ELSE 'dynamic' END AS mode,
        |  LENGTH(text) AS n_chars,
        |  CAST(STRLEN(text) AS BIGINT) AS payload_bytes,
        |  MD5(text) AS digest
        |FROM documents""".stripMargin,
    // quoting DECISION predicted from content alone (RFC 4180: quote
    // iff comma/quote/CR/LF present) while the engine reads it off the
    // emitted line — writer behavior checked against the spec's rule
    "q_csv_roundtrip" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
        |             CASE WHEN doc_id % 4 = 0
        |               THEN 'a,"b"' || chr(10) || text ELSE text END
        |               AS text
        |           FROM documents)
        |SELECT doc_id, lang, LENGTH(text) AS n_chars,
        |  (text LIKE '%,%' OR text LIKE '%"%'
        |    OR text LIKE '%' || chr(10) || '%'
        |    OR text LIKE '%' || chr(13) || '%') AS text_quoted,
        |  TRUE AS roundtrip
        |FROM d""".stripMargin,
    // the oracle derives the expected PARSE OUTPUT independently — if
    // Spark's to_json/from_json pair lost or mangled anything (quotes,
    // newlines, unicode), roundtrip/digest break the hash; truncated
    // lines (every 50th) must come back as NULL-field parse failures
    "q_jsonl_roundtrip" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  doc_id % 50 <> 0 AS parse_ok,
        |  CASE WHEN doc_id % 50 = 0 THEN NULL ELSE lang END AS lang,
        |  CASE WHEN doc_id % 50 = 0 THEN NULL ELSE source END AS source,
        |  CASE WHEN doc_id % 50 = 0 THEN NULL
        |       ELSE LENGTH(text) END AS n_chars,
        |  CASE WHEN doc_id % 50 = 0 THEN NULL ELSE MD5(text) END
        |    AS digest,
        |  doc_id % 50 <> 0 AS roundtrip
        |FROM documents""".stripMargin,
    "q_warc_ingest" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(doc_id AS BIGINT) // 64 AS warc_file,
        |  'graft://' || source || '/doc/'
        |    || CAST(CAST(doc_id AS BIGINT) AS VARCHAR) AS target_uri,
        |  strftime(make_timestamp(
        |    (1600000000 + CAST(doc_id AS BIGINT)) * 1000000),
        |    '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
        |  LENGTH(text) AS n_chars,
        |  CAST(STRLEN(text) AS BIGINT) AS payload_bytes,
        |  MD5(text) AS digest
        |FROM documents""".stripMargin,
    // geographic layer measured by haversine km, projected layer planar
    // in meters — the CASE the engine decides from the CRS tag
    "q_crs_distance" ->
      """WITH e AS (SELECT CAST(event_id AS BIGINT) AS id FROM events),
        |geo AS (SELECT id,
        |  CAST(id * 73 % 360 - 180 AS DOUBLE) AS x1,
        |  CAST(id * 179 % 160 - 80 AS DOUBLE) AS y1,
        |  CAST(id * 31 % 360 - 180 AS DOUBLE) AS x2,
        |  CAST(id * 97 % 160 - 80 AS DOUBLE) AS y2 FROM e),
        |prj AS (SELECT id,
        |  CAST(id * 73 % 100000 AS DOUBLE) AS x1,
        |  CAST(id * 179 % 100000 AS DOUBLE) AS y1,
        |  CAST(id * 31 % 100000 AS DOUBLE) AS x2,
        |  CAST(id * 97 % 100000 AS DOUBLE) AS y2 FROM e)
        |SELECT id, CAST(4326 AS BIGINT) AS epsg, TRUE AS geographic,
        |  ROUND(6367 * ACOS(COS((y1 - y2) * 0.0174532925)
        |    - COS(y1 * 0.0174532925) * COS(y2 * 0.0174532925)
        |    * (1 - COS((x1 - x2) * 0.0174532925))), 3) AS dist
        |FROM geo
        |UNION ALL
        |SELECT id, CAST(32633 AS BIGINT) AS epsg, FALSE AS geographic,
        |  ROUND(SQRT((x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)), 3)
        |    AS dist
        |FROM prj""".stripMargin,
    // bucketing must never change answers: the oracle is the plain join
    "q_bucketed_join" ->
      """SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
        |  CAST(o.o_custkey AS BIGINT) AS o_custkey,
        |  COUNT(*) AS n_items,
        |  ROUND(SUM(l.l_quantity), 2) AS sum_qty
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2""".stripMargin,

    // WKB: the engine writes real OGC WKB bytes (both byte orders) and
    // parses them back; the oracle replays the ring geometry
    // analytically from the same generating formulas, and n_bytes pins
    // the writer's layout (1 order byte + uint32 type + uint32 ring
    // count + per ring uint32 count + 16 bytes/point).
    "q_read_wkb" ->
      """WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS pid FROM nation),
        |g AS (SELECT pid, pid*7%50 AS x0, pid*13%50 AS y0,
        |        10 + pid%5 AS w, 8 + pid%7 AS h FROM n),
        |r AS (
        |  SELECT pid, 1 AS ri,
        |    [CAST(x0 AS DOUBLE), x0+w, x0+w, x0, x0] AS xs,
        |    [CAST(y0 AS DOUBLE), y0, y0+h, y0+h, y0] AS ys FROM g
        |  UNION ALL SELECT pid, 2,
        |    [CAST(x0+2 AS DOUBLE), x0+4, x0+4, x0+2, x0+2],
        |    [CAST(y0+2 AS DOUBLE), y0+2, y0+4, y0+4, y0+2] FROM g
        |  UNION ALL SELECT pid, 3,
        |    [CAST(x0+100 AS DOUBLE), x0+105, x0+105, x0+100, x0+100],
        |    [CAST(y0 AS DOUBLE), y0, y0+5, y0+5, y0] FROM g)
        |SELECT pid, pid % 2 = 0 AS ndr,
        |  CAST(9 + 3 * (4 + 16 * 5) AS BIGINT) AS n_bytes,
        |  CAST(ri AS BIGINT) AS ri, CAST(5 AS BIGINT) AS n_pts,
        |  ROUND(ABS(list_sum(list_transform(range(1, 5),
        |      i -> xs[i]*ys[i+1] - xs[i+1]*ys[i]))) / 2.0, 4) AS area,
        |  ROUND(list_sum(list_transform(range(1, 5),
        |      i -> sqrt((xs[i+1]-xs[i])*(xs[i+1]-xs[i])
        |             + (ys[i+1]-ys[i])*(ys[i+1]-ys[i])))), 4) AS peri,
        |  '(' || array_to_string(list_transform(range(1, 6),
        |      i -> CAST(xs[i] AS VARCHAR) || ' ' || CAST(ys[i] AS VARCHAR)),
        |      ', ') || ')' AS ring_wkt
        |FROM r""".stripMargin,

    // REAL round-trip check: Spark encodes genuine RIFF/WAVE PCM bytes
    // and decodes them back with a real chunk-walking parser; the
    // oracle computes the same features ANALYTICALLY from the synth
    // parameters (sample i of doc d = ((d*31 + i*17) % 2003) - 1001,
    // 256 + d % 256 samples at 8 kHz). Hash equality holds ONLY if the
    // encoder wrote a valid container and the decoder read back exactly
    // the samples written — the byte layer cannot silently drift.
    "q_multimodal_wav" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |s AS (SELECT doc_id, 256 + doc_id % 256 AS n FROM d),
        |samp AS (SELECT doc_id, n,
        |           ((doc_id * 31 + i * 17) % 2003) - 1001 AS v
        |         FROM s,
        |         LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) u)
        |SELECT doc_id, n AS n_samples, CAST(8000 AS BIGINT) AS sample_rate,
        |  n * 1000 // 8000 AS duration_ms,
        |  CAST(SUM(v * v) AS BIGINT) AS sum_sq, MAX(ABS(v)) AS peak
        |FROM samp GROUP BY doc_id, n""".stripMargin,

    // Video: the GVID container (magic + frame table + concatenated
    // real BMP frames) is encoded, then every 2nd frame is sliced by
    // the declared frame size and decoded with the real BMP parser.
    // Frame f of doc d carries the pixels of synthetic image id
    // 45*(d+f) (45 = lcm(9,5) pins frame dims at 8x8 so the frame
    // table is uniform); the oracle replays the sampled frames'
    // channel sums analytically.
    "q_multimodal_video" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |fr AS (SELECT doc_id, f FROM d,
        |       LATERAL (SELECT unnest(generate_series(0,
        |                  4 + doc_id % 8 - 1)) AS f) u
        |       WHERE f % 2 = 0),
        |px AS (SELECT doc_id, f, (doc_id + f) * 45 AS id45, x, y
        |       FROM fr,
        |       LATERAL (SELECT unnest(generate_series(0, 7)) AS x) u,
        |       LATERAL (SELECT unnest(generate_series(0, 7)) AS y) v)
        |SELECT doc_id, f AS frame_idx,
        |  CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  CAST(SUM((id45 * 3 + x * 29 + y * 23) % 256) AS BIGINT)
        |    AS sum_r,
        |  CAST(SUM((id45 * 11 + x * 17 + y * 5) % 256) AS BIGINT)
        |    AS sum_g,
        |  CAST(SUM((id45 * 7 + x * 13 + y * 31) % 256) AS BIGINT)
        |    AS sum_b
        |FROM px GROUP BY doc_id, f""".stripMargin,

    // Keyframes: channel sums per frame are analytic in (doc_id, scene)
    // exactly as q_multimodal_video's are in (doc_id, frame); the diff/
    // flag chain replays as a LAG window over the analytic sums.
    "q_video_keyframes" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |p AS (SELECT doc_id, 12 + doc_id % 6 AS nf,
        |        3 + doc_id % 3 AS sl FROM d),
        |fr AS (SELECT doc_id, f, (doc_id + (f // sl)) * 45 AS id45
        |       FROM p, LATERAL (SELECT unnest(generate_series(0,
        |                CAST(nf - 1 AS INT))) AS f) u),
        |sums AS (SELECT doc_id, f,
        |    SUM((id45 * 3 + x * 29 + y * 23) % 256) AS sr,
        |    SUM((id45 * 11 + x * 17 + y * 5) % 256) AS sg,
        |    SUM((id45 * 7 + x * 13 + y * 31) % 256) AS sb
        |  FROM fr,
        |  LATERAL (SELECT unnest(generate_series(0, 7)) AS x) u,
        |  LATERAL (SELECT unnest(generate_series(0, 7)) AS y) v
        |  GROUP BY doc_id, f),
        |df AS (SELECT doc_id, f,
        |    COALESCE(ABS(sr - LAG(sr) OVER w) + ABS(sg - LAG(sg) OVER w)
        |           + ABS(sb - LAG(sb) OVER w), 0) AS diff_metric
        |  FROM sums
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
        |fl AS (SELECT doc_id, f, diff_metric,
        |    f = 0 OR diff_metric > 0 AS is_keyframe FROM df),
        |nk AS (SELECT doc_id,
        |    SUM(CASE WHEN is_keyframe THEN 1 ELSE 0 END) AS n_keyframes
        |  FROM fl GROUP BY 1)
        |SELECT fl.doc_id, CAST(fl.f AS BIGINT) AS frame_idx,
        |  CAST(fl.diff_metric AS BIGINT) AS diff_metric, fl.is_keyframe,
        |  CAST(nk.n_keyframes AS BIGINT) AS n_keyframes
        |FROM fl JOIN nk ON fl.doc_id = nk.doc_id""".stripMargin,

    // H.264: every field is analytic in doc_id (the generator's clip
    // parameters), so the oracle replays what the real NAL/exp-Golomb
    // parse must recover; n_epb counts the emulation-prevention bytes
    // the forced 00 00 00 payload runs make the writer insert.
    "q_multimodal_h264" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |p AS (SELECT doc_id, 3 + doc_id % 5 AS n_slices FROM d)
        |SELECT doc_id,
        |  2 + n_slices AS n_nals,
        |  (2 + doc_id % 9) * 16 AS width,
        |  (2 + doc_id % 5) * 16 AS height,
        |  10 + (doc_id % 4) * 10 AS level_idc,
        |  20 + doc_id % 16 AS init_qp,
        |  n_slices,
        |  CAST(1 AS BIGINT) AS n_idr,
        |  n_slices * (n_slices - 1) // 2 AS sum_frame_num,
        |  (doc_id % 4) * n_slices AS n_epb
        |FROM p""".stripMargin,

    // MP4: a REAL ISO BMFF file per clip — ftyp/moov/mdat, full box
    // tree, and a complete sample table (stsd/stts/stsc/stsz/stco)
    // whose sample sizes VARY (each sample is a real BMP of dims keyed
    // by doc_id + 7f) and whose samples pack two-per-chunk with a
    // short last chunk — so the decoder's chunk-map walk and absolute
    // offset reconstruction are load-bearing. Every 2nd sample is
    // sliced and decoded by the real BMP parser; the oracle replays
    // the sampled frames analytically: n = 3 + doc_id % 6 samples,
    // 40 ms each at timescale 1000, frame f = BMP of id doc_id + 7f.
    "q_multimodal_mp4" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |fr AS (SELECT doc_id, 3 + doc_id % 6 AS n, f FROM d,
        |       LATERAL (SELECT unnest(generate_series(0,
        |                  3 + doc_id % 6 - 1)) AS f) u
        |       WHERE f % 2 = 0),
        |dim AS (SELECT doc_id, n, f, doc_id + 7 * f AS id2,
        |          8 + (doc_id + 7 * f) % 9 AS w,
        |          8 + (doc_id + 7 * f) % 5 AS h
        |        FROM fr),
        |px AS (SELECT doc_id, n, f, w, h, x, y,
        |         (id2 * 3 + x * 29 + y * 23) % 256 AS r,
        |         (id2 * 11 + x * 17 + y * 5) % 256 AS g,
        |         (id2 * 7 + x * 13 + y * 31) % 256 AS b
        |       FROM dim,
        |       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) u,
        |       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) v)
        |SELECT doc_id, f AS sample_idx, n AS n_samples,
        |  n * 40 AS duration_ms,
        |  54 + (w * 3 + (4 - (w * 3) % 4) % 4) * h AS sample_bytes,
        |  w AS width, h AS height,
        |  CAST(SUM(r) AS BIGINT) AS sum_r,
        |  CAST(SUM(g) AS BIGINT) AS sum_g,
        |  CAST(SUM(b) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id, n, f, w, h""".stripMargin,

    // MP3: a real MPEG-1 Layer III frame stream per doc — leading
    // ID3v2.3 tag (10 + 32 bytes, syncsafe length), then 4..8 VBR
    // frames whose bitrate index walks the spec table; the walker's
    // per-frame length formula 144*kbps*1000/sr + pad (integer
    // division) and the table lookups are replayed analytically here.
    // 1152 samples per frame gives the exact integer duration.
    "q_multimodal_mp3" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |fr AS (SELECT doc_id, 4 + doc_id % 5 AS n, i,
        |         CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |              ELSE 32000 END AS sr,
        |         [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
        |          256, 320][CAST(1 + (doc_id + i) % 14 AS INT)] AS kbps,
        |         (doc_id + i) % 2 AS pad
        |       FROM d,
        |       LATERAL (SELECT unnest(generate_series(0,
        |                  4 + doc_id % 5 - 1)) AS i) u)
        |SELECT doc_id, n AS n_frames, CAST(sr AS BIGINT) AS sample_rate,
        |  CAST(42 + SUM(144 * kbps * 1000 // sr + pad) AS BIGINT)
        |    AS n_bytes,
        |  CAST(SUM(kbps) AS BIGINT) AS sum_kbps,
        |  n * 1152 * 1000 // sr AS duration_ms
        |FROM fr GROUP BY doc_id, n, sr""".stripMargin,

    // Layer III spectral decode replayed analytically: the coded
    // spectrum is the closed-form {-1,0,1} pattern, so requantize is
    // v * 2^((gg-210)/4) * 2^(-(1+sfs)*sf) (|v|^(4/3) = |v|), the alias
    // butterflies act on lines 10..25 / 28..43 with the spec ci
    // constants, and the windowed IMDCT + overlap-add is an 18-term
    // cos sum per output sample (k ascending, matching the engine's
    // fold order) with LAG carrying each granule's window tail.
    "q_multimodal_mp3_spectral" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |ab AS (SELECT
        |  list_transform([-0.6,-0.535,-0.33,-0.185,-0.095,-0.041,
        |                  -0.0142,-0.0037], c -> 1.0/sqrt(1.0+c*c)) AS cs,
        |  list_transform([-0.6,-0.535,-0.33,-0.185,-0.095,-0.041,
        |                  -0.0142,-0.0037], c -> c/sqrt(1.0+c*c)) AS ca),
        |g AS (SELECT doc_id, f, gr,
        |        200 + (doc_id + f + gr) % 16 AS gg,
        |        doc_id % 2 AS sfs
        |      FROM d,
        |      LATERAL (SELECT unnest(generate_series(0,
        |                 2 + doc_id % 3 - 1)) AS f) u,
        |      (SELECT unnest([0, 1]) AS gr) v),
        |xr AS (SELECT doc_id, f, gr,
        |        list_transform(range(0, 36), i ->
        |          CAST((doc_id*7 + f*5 + gr*11 + i*13) % 3 - 1 AS DOUBLE)
        |          * POWER(2.0, (gg - 210) / 4.0)
        |          * POWER(2.0, -(1.0 + sfs) *
        |              CAST((doc_id + gr + (CASE WHEN i < 24 THEN i // 4
        |                WHEN i < 30 THEN 6 ELSE 7 END)) % 2 AS DOUBLE)))
        |          AS x
        |       FROM g),
        |xal AS (SELECT doc_id, f, gr,
        |        list_transform(range(0, 54), i -> CASE
        |          WHEN i <= 9 THEN x[i+1]
        |          WHEN i <= 17 THEN x[i+1]*cs[17-i+1] - x[35-i+1]*ca[17-i+1]
        |          WHEN i <= 25 THEN x[i+1]*cs[i-18+1] + x[35-i+1]*ca[i-18+1]
        |          WHEN i <= 27 THEN x[i+1]
        |          WHEN i <= 35 THEN x[i+1]*cs[35-i+1]
        |          WHEN i <= 43 THEN x[71-i+1]*ca[i-36+1]
        |          ELSE 0.0 END) AS xa
        |       FROM xr, ab),
        |sbv AS (SELECT doc_id, f*2 + gr AS gi, sb,
        |          list_transform(range(0, 18),
        |            k -> xa[18*sb + k + 1]) AS xs
        |        FROM xal, (SELECT unnest([0, 1, 2]) AS sb) s),
        |zw AS (SELECT doc_id, gi, sb, xs,
        |         list_transform(range(0, 36), i ->
        |           list_sum(list_transform(range(0, 18), k ->
        |             xs[k+1] * cos(pi() / 72.0 * (2*i + 19) * (2*k + 1))))
        |           * sin(pi() / 36.0 * (i + 0.5))) AS z
        |       FROM sbv),
        |ola AS (SELECT doc_id, gi, sb, xs, z,
        |          lag(z) OVER (PARTITION BY doc_id, sb ORDER BY gi) AS zp
        |        FROM zw)
        |SELECT doc_id, gi, CAST(sb AS BIGINT) AS subband,
        |  ROUND(list_sum(list_transform(range(0, 18),
        |    i -> xs[i+1] * xs[i+1])), 6) AS e_spec,
        |  ROUND(list_sum(list_transform(range(0, 18),
        |    i -> (z[i+1] + COALESCE(zp[i+19], 0.0))
        |       * (z[i+1] + COALESCE(zp[i+19], 0.0)))), 6) AS e_ola
        |FROM ola""".stripMargin,

    // Layer III PCM replayed analytically: the spectral chain above,
    // then frequency inversion (odd samples of odd subbands negate),
    // N-matrixing P[r] = sum_k cos((16+r)(2k+1)pi/64) S[k] over the 3
    // nonzero subbands, and the polyphase window: out_t[j] =
    // sum_a D[64a+j] P_{t-2a}[j] + D[64a+32+j] P_{t-2a-1}[32+j]
    // (the V-FIFO/U-extraction algebra, 16 lagged taps via LAG). The
    // half-sine 512-tap prototype is the engine's documented stand-in
    // for ISO Table B.3. Energy sums are ORDERED (list_sum over
    // list(ORDER BY t)) to mirror the engine's fold exactly.
    "q_multimodal_mp3_pcm" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |ab AS (SELECT
        |  list_transform([-0.6,-0.535,-0.33,-0.185,-0.095,-0.041,
        |                  -0.0142,-0.0037], c -> 1.0/sqrt(1.0+c*c)) AS cs,
        |  list_transform([-0.6,-0.535,-0.33,-0.185,-0.095,-0.041,
        |                  -0.0142,-0.0037], c -> c/sqrt(1.0+c*c)) AS ca),
        |g AS (SELECT doc_id, f, gr,
        |        200 + (doc_id + f + gr) % 16 AS gg,
        |        doc_id % 2 AS sfs
        |      FROM d,
        |      LATERAL (SELECT unnest(generate_series(0,
        |                 2 + doc_id % 3 - 1)) AS f) u,
        |      (SELECT unnest([0, 1]) AS gr) v),
        |xr AS (SELECT doc_id, f, gr,
        |        list_transform(range(0, 36), i ->
        |          CAST((doc_id*7 + f*5 + gr*11 + i*13) % 3 - 1 AS DOUBLE)
        |          * POWER(2.0, (gg - 210) / 4.0)
        |          * POWER(2.0, -(1.0 + sfs) *
        |              CAST((doc_id + gr + (CASE WHEN i < 24 THEN i // 4
        |                WHEN i < 30 THEN 6 ELSE 7 END)) % 2 AS DOUBLE)))
        |          AS x
        |       FROM g),
        |xal AS (SELECT doc_id, f, gr,
        |        list_transform(range(0, 54), i -> CASE
        |          WHEN i <= 9 THEN x[i+1]
        |          WHEN i <= 17 THEN x[i+1]*cs[17-i+1] - x[35-i+1]*ca[17-i+1]
        |          WHEN i <= 25 THEN x[i+1]*cs[i-18+1] + x[35-i+1]*ca[i-18+1]
        |          WHEN i <= 27 THEN x[i+1]
        |          WHEN i <= 35 THEN x[i+1]*cs[35-i+1]
        |          WHEN i <= 43 THEN x[71-i+1]*ca[i-36+1]
        |          ELSE 0.0 END) AS xa
        |       FROM xr, ab),
        |sbv AS (SELECT doc_id, f*2 + gr AS gi, sb,
        |          list_transform(range(0, 18),
        |            k -> xa[18*sb + k + 1]) AS xs
        |        FROM xal, (SELECT unnest([0, 1, 2]) AS sb) s),
        |zw AS (SELECT doc_id, gi, sb,
        |         list_transform(range(0, 36), i ->
        |           list_sum(list_transform(range(0, 18), k ->
        |             xs[k+1] * cos(pi() / 72.0 * (2*i + 19) * (2*k + 1))))
        |           * sin(pi() / 36.0 * (i + 0.5))) AS z
        |       FROM sbv),
        |ola AS (SELECT doc_id, gi, sb, z,
        |          lag(z) OVER (PARTITION BY doc_id, sb ORDER BY gi) AS zp
        |        FROM zw),
        |s18 AS (SELECT doc_id, gi, sb,
        |          list_transform(range(0, 18), i ->
        |            (z[i+1] + COALESCE(zp[i+19], 0.0))
        |            * (CASE WHEN sb % 2 = 1 AND i % 2 = 1
        |                    THEN -1.0 ELSE 1.0 END)) AS s
        |        FROM ola),
        |tv AS (SELECT doc_id, gi * 18 + i AS t, sb, s[i + 1] AS v
        |       FROM s18,
        |       (SELECT unnest(generate_series(0, 17)) AS i) ti),
        |sv AS (SELECT doc_id, t, list(v ORDER BY sb) AS s3
        |       FROM tv GROUP BY doc_id, t),
        |nb AS (SELECT
        |  list_transform(range(0, 64), r -> list_transform(range(0, 3),
        |    k -> cos(pi() / 64.0 * (16 + r) * (2 * k + 1)))) AS nm,
        |  list_transform(range(0, 512), n ->
        |    sin(pi() * (n + 0.5) / 512.0)) AS dw),
        |pt AS (SELECT doc_id, t, dw,
        |         list_transform(range(0, 64), r ->
        |           list_sum(list_transform(range(0, 3),
        |             k -> nm[r+1][k+1] * s3[k+1]))) AS p
        |       FROM sv, nb),
        |hh AS (SELECT doc_id, t, dw, [p,
        |         lag(p, 1) OVER w, lag(p, 2) OVER w, lag(p, 3) OVER w,
        |         lag(p, 4) OVER w, lag(p, 5) OVER w, lag(p, 6) OVER w,
        |         lag(p, 7) OVER w, lag(p, 8) OVER w, lag(p, 9) OVER w,
        |         lag(p, 10) OVER w, lag(p, 11) OVER w, lag(p, 12) OVER w,
        |         lag(p, 13) OVER w, lag(p, 14) OVER w,
        |         lag(p, 15) OVER w] AS hist
        |       FROM pt
        |       WINDOW w AS (PARTITION BY doc_id ORDER BY t)),
        |op AS (SELECT doc_id, t,
        |         list_transform(range(0, 32), j ->
        |           list_sum(list_transform(range(0, 8), a ->
        |             dw[64*a + j + 1]
        |               * COALESCE(hist[2*a + 1][j + 1], 0.0)
        |             + dw[64*a + 32 + j + 1]
        |               * COALESCE(hist[2*a + 2][32 + j + 1], 0.0)))) AS o
        |       FROM hh),
        |er AS (SELECT doc_id, t,
        |         list_sum(list_transform(o, v -> v * v)) AS e_row,
        |         list_max(list_transform(o, v -> abs(v))) AS peak_row
        |       FROM op)
        |SELECT doc_id, t // 18 AS gi,
        |  ROUND(list_sum(list(e_row ORDER BY t)), 6) AS e_pcm,
        |  ROUND(MAX(peak_row), 6) AS peak_pcm
        |FROM er GROUP BY doc_id, t // 18""".stripMargin,

    // dHash image near-dup replayed analytically: the group-keyed
    // pixel formulas (base pattern from gk = doc_id % 1000, sparse
    // per-doc +40 bumps), the 11x6 nearest-sample luma grid, the
    // 60-bit gradient hash as a SUM of distinct powers of two, the
    // 4x15-bit band self-join, and the Hamming verify — DISTINCT here
    // equals the engine's min-band single emission.
    "q_image_phash" ->
      s"""WITH $imageSigCtes
        |SELECT ida, idb,
        |  CAST(bit_count(xor(siga, sigb)) AS BIGINT) AS hamming
        |FROM pr WHERE bit_count(xor(siga, sigb)) <= 10""".stripMargin,

    // banding recall priced against the ALL-PAIRS truth the bands
    // exist to avoid (the dedup_eval move for the image modality):
    // precision is 1 by construction (candidates verify on the same
    // hamming), recall < 1 exactly when all 4 bands differ; the whole
    // chain runs over the bounded content-keyed eval slice
    "q_image_hash_eval" ->
      s"""WITH ${imageSigCtesOn(imageEvalBase)},
        |tr AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
        |         CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS ham
        |       FROM sg a JOIN sg b ON a.doc_id < b.doc_id),
        |j AS (SELECT tr.ham, pr.ida IS NOT NULL AS banded
        |      FROM tr LEFT JOIN pr
        |        ON pr.ida = tr.ida AND pr.idb = tr.idb),
        |th AS (SELECT CAST(t AS BIGINT) AS t
        |       FROM (VALUES (6), (10), (14)) v(t)),
        |m AS (SELECT t,
        |        SUM(CASE WHEN ham <= t THEN 1 ELSE 0 END) AS n_truth,
        |        SUM(CASE WHEN banded AND ham <= t THEN 1 ELSE 0 END)
        |          AS n_pred
        |      FROM j, th GROUP BY t)
        |SELECT t, CAST(n_truth AS BIGINT) AS n_truth,
        |  CAST(n_pred AS BIGINT) AS n_pred,
        |  CAST(n_truth - n_pred AS BIGINT) AS fn,
        |  CASE WHEN n_truth = 0 THEN 1.0
        |       ELSE ROUND(CAST(n_pred AS DOUBLE)
        |         / CAST(n_truth AS DOUBLE), 4) END AS recall
        |FROM m""".stripMargin,

    // Frame-level audio features (VAD shape) over REAL decoded WAV
    // samples: 64-sample frames (incomplete tail dropped), per-frame
    // energy / zero-crossing count / peak replayed analytically from
    // the synth formula; zcr needs LAG within the frame.
    "q_multimodal_audio_frames" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |sp AS (SELECT doc_id, i,
        |         ((doc_id * 31 + i * 17) % 2003) - 1001 AS v,
        |         i // 64 AS f, i % 64 AS j
        |       FROM d,
        |       LATERAL (SELECT unnest(generate_series(0,
        |                  256 + doc_id % 256 - 1)) AS i) u
        |       WHERE i // 64 < (256 + doc_id % 256) // 64),
        |z AS (SELECT doc_id, f, j, v,
        |        LAG(v) OVER (PARTITION BY doc_id, f ORDER BY j) AS pv
        |      FROM sp)
        |SELECT doc_id, f AS frame_idx,
        |  CAST(SUM(v * v) AS BIGINT) AS energy,
        |  CAST(SUM(CASE WHEN pv IS NOT NULL
        |                 AND ((v >= 0) <> (pv >= 0))
        |            THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
        |  MAX(ABS(v)) AS peak
        |FROM z GROUP BY doc_id, f""".stripMargin,

    // Image augmentation on real decoded BMP pixels: channel sums are
    // flip/rotation-invariant, so each variant is pinned by the
    // position-weighted red checksum in its OWN coordinate frame —
    // the oracle iterates original coordinates with the transformed
    // weights (flip: x -> w-1-x; rot90 cw: weight x*h + (h-1-y) + 1
    // with dims swapped; crop: center 4x4 offsets).
    "q_multimodal_augment" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |dim AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 5 AS h
        |        FROM d),
        |px AS (SELECT doc_id, w, h, x, y,
        |         (doc_id * 3 + x * 29 + y * 23) % 256 AS r
        |       FROM dim,
        |       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) u,
        |       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) v)
        |SELECT doc_id, 'orig' AS variant, w AS width, h AS height,
        |  CAST(SUM(r) AS BIGINT) AS sum_r,
        |  CAST(SUM((y * w + x + 1) * r) AS BIGINT) AS wsum_r
        |FROM px GROUP BY doc_id, w, h
        |UNION ALL
        |SELECT doc_id, 'flip', w, h, CAST(SUM(r) AS BIGINT),
        |  CAST(SUM((y * w + (w - 1 - x) + 1) * r) AS BIGINT)
        |FROM px GROUP BY doc_id, w, h
        |UNION ALL
        |SELECT doc_id, 'rot90', h, w, CAST(SUM(r) AS BIGINT),
        |  CAST(SUM((x * h + (h - 1 - y) + 1) * r) AS BIGINT)
        |FROM px GROUP BY doc_id, w, h
        |UNION ALL
        |SELECT doc_id, 'crop', 4, 4, CAST(SUM(r) AS BIGINT),
        |  CAST(SUM(((y - (h - 4) // 2) * 4
        |            + (x - (w - 4) // 2) + 1) * r) AS BIGINT)
        |FROM px
        |WHERE x >= (w - 4) // 2 AND x < (w - 4) // 2 + 4
        |  AND y >= (h - 4) // 2 AND y < (h - 4) // 2 + 4
        |GROUP BY doc_id, w, h""".stripMargin,

    // Same round-trip idea for images: Spark encodes genuine 24-bit BMP
    // bytes (bottom-up padded BGR rows) per document, decodes them with
    // a real parser, and runs a real 2x nearest-neighbor resize on the
    // decoded pixels; the oracle computes full-image and resized
    // channel sums analytically (pixel (x,y) of doc d given by exact
    // integer formulas, resize samples even coordinates).
    "q_multimodal_bmp" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |dim AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 5 AS h
        |        FROM d),
        |px AS (SELECT doc_id, w, h, x, y,
        |         (doc_id * 3 + x * 29 + y * 23) % 256 AS r,
        |         (doc_id * 11 + x * 17 + y * 5) % 256 AS g,
        |         (doc_id * 7 + x * 13 + y * 31) % 256 AS b
        |       FROM dim,
        |       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) u,
        |       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) v)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(SUM(r) AS BIGINT) AS sum_r,
        |  CAST(SUM(g) AS BIGINT) AS sum_g,
        |  CAST(SUM(b) AS BIGINT) AS sum_b,
        |  w // 2 AS rwidth, h // 2 AS rheight,
        |  CAST(SUM(CASE WHEN x % 2 = 0 AND x < (w // 2) * 2
        |                 AND y % 2 = 0 AND y < (h // 2) * 2
        |            THEN r END) AS BIGINT) AS rsum_r,
        |  CAST(SUM(CASE WHEN x % 2 = 0 AND x < (w // 2) * 2
        |                 AND y % 2 = 0 AND y < (h // 2) * 2
        |            THEN g END) AS BIGINT) AS rsum_g,
        |  CAST(SUM(CASE WHEN x % 2 = 0 AND x < (w // 2) * 2
        |                 AND y % 2 = 0 AND y < (h // 2) * 2
        |            THEN b END) AS BIGINT) AS rsum_b
        |FROM px GROUP BY doc_id, w, h""".stripMargin,

    // PNG: Spark encodes a genuine PNG per document (zlib-deflated
    // scanlines, filters cycling None/Sub/Up/Average/Paeth by row,
    // two IDAT chunks, CRC on every chunk) and decodes it back with a
    // real chunk-walking, CRC-checking, inflating, unfiltering parser.
    // The oracle replays the decoded pixels analytically (pixel (x,y)
    // of doc d by exact integer formulas); the grad_r term (sum of
    // horizontal neighbor |differences| in the red channel) makes row
    // order and every unfilter path load-bearing, not just the sums.
    "q_multimodal_png" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |dim AS (SELECT doc_id, 12 + doc_id % 7 AS w, 9 + doc_id % 6 AS h
        |        FROM d),
        |px AS (SELECT doc_id, w, h, x, y,
        |         (doc_id * 5 + x * 19 + y * 37) % 256 AS r,
        |         (doc_id * 23 + x * 7 + y * 11) % 256 AS g,
        |         (doc_id * 13 + x * 3 + y * 29) % 256 AS b,
        |         CASE WHEN x > 0 THEN
        |           ABS((doc_id * 5 + x * 19 + y * 37) % 256
        |             - (doc_id * 5 + (x - 1) * 19 + y * 37) % 256)
        |         ELSE 0 END AS dr
        |       FROM dim,
        |       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) u,
        |       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) v)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(SUM(r) AS BIGINT) AS sum_r,
        |  CAST(SUM(g) AS BIGINT) AS sum_g,
        |  CAST(SUM(b) AS BIGINT) AS sum_b,
        |  CAST(SUM(dr) AS BIGINT) AS grad_r
        |FROM px GROUP BY doc_id, w, h""".stripMargin,

    // JPEG corpus images are constant per 8x8 block with even values, so
    // the baseline decode is BIT-exact (DC-only blocks quantize
    // losslessly — Jpeg.scala header) and this oracle replays the
    // decoded YCbCr planes from the same block-value key math.
    "q_multimodal_jpeg" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |dim AS (SELECT doc_id, 20 + doc_id % 13 AS w, 16 + doc_id % 11 AS h
        |        FROM d),
        |px AS (SELECT doc_id, w, h, x, y,
        |         ((doc_id * 17 + (x // 8) * 29 + (y // 8) * 41) % 128) * 2 AS yy,
        |         ((doc_id * 7 + (x // 8) * 13 + (y // 8) * 23) % 128) * 2 AS cb,
        |         ((doc_id * 11 + (x // 8) * 19 + (y // 8) * 31) % 128) * 2 AS cr,
        |         CASE WHEN x > 0 THEN
        |           ABS(((doc_id * 17 + (x // 8) * 29 + (y // 8) * 41) % 128) * 2
        |             - ((doc_id * 17 + ((x - 1) // 8) * 29 + (y // 8) * 41) % 128) * 2)
        |         ELSE 0 END AS dy
        |       FROM dim,
        |       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) u,
        |       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) v)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(SUM(yy) AS BIGINT) AS sum_y,
        |  CAST(SUM(cb) AS BIGINT) AS sum_cb,
        |  CAST(SUM(cr) AS BIGINT) AS sum_cr,
        |  CAST(SUM(dy) AS BIGINT) AS grad_y
        |FROM px GROUP BY doc_id, w, h""".stripMargin,

    // 4:2:0 twin: Y constant per 8x8 as above, chroma constant per
    // 16x16 — the box-average subsample and replication upsample are
    // both exact on constant regions, so this oracle replays the
    // decoded planes of the SUBSAMPLED file analytically.
    "q_multimodal_jpeg420" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id
        |           FROM documents),
        |dim AS (SELECT doc_id, 20 + doc_id % 13 AS w, 16 + doc_id % 11 AS h
        |        FROM d),
        |px AS (SELECT doc_id, w, h, x, y,
        |         ((doc_id * 17 + (x // 8) * 29 + (y // 8) * 41) % 128) * 2 AS yy,
        |         ((doc_id * 7 + (x // 16) * 13 + (y // 16) * 23) % 128) * 2 AS cb,
        |         ((doc_id * 11 + (x // 16) * 19 + (y // 16) * 31) % 128) * 2 AS cr,
        |         CASE WHEN x > 0 THEN
        |           ABS(((doc_id * 17 + (x // 8) * 29 + (y // 8) * 41) % 128) * 2
        |             - ((doc_id * 17 + ((x - 1) // 8) * 29 + (y // 8) * 41) % 128) * 2)
        |         ELSE 0 END AS dy
        |       FROM dim,
        |       LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) u,
        |       LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) v)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(SUM(yy) AS BIGINT) AS sum_y,
        |  CAST(SUM(cb) AS BIGINT) AS sum_cb,
        |  CAST(SUM(cr) AS BIGINT) AS sum_cr,
        |  CAST(SUM(dy) AS BIGINT) AS grad_y
        |FROM px GROUP BY doc_id, w, h""".stripMargin,

    // The "decode" is a deterministic stub (polynomial checksum over the
    // payload bytes); with ASCII text payloads the byte stream equals the
    // char stream, so DuckDB can replay the exact fold — making even the
    // stubbed pipeline hash-checked end to end.
    "q_multimodal" ->
      """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text
        |           FROM documents),
        |f AS (SELECT doc_id,
        |        ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)]
        |          AS kind,
        |        CAST(len(text) AS BIGINT) AS n_bytes,
        |        list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(list_filter(string_split(text, ''),
        |                                     c -> len(c) > 0),
        |                         c -> CAST(ascii(c) AS BIGINT))),
        |          (a, b) -> (a * 131 + b) % 1000000007) AS checksum
        |      FROM d)
        |SELECT doc_id, kind, n_bytes, checksum,
        |  16 + checksum % 16 AS width,
        |  16 + (checksum // 16) % 16 AS height
        |FROM f""".stripMargin,

    // GeoJSON: the oracle rebuilds the identical Feature bytes from the
    // pid arithmetic, corrupts the same lines, and re-parses with
    // DuckDB's own JSON engine (json_valid + nested-list cast + the
    // same RFC validation), then re-derives every output — a bug in
    // the Spark writer OR parser breaks the hash
    "q_read_geojson" -> {
      def pos(x: String, y: String) =
        s"'[' || CAST($x AS VARCHAR) || ',' || CAST($y AS VARCHAR) || ']'"
      def ring(pts: Seq[(String, String)]) =
        "'[' || " + pts.map { case (x, y) => pos(x, y) }
          .mkString(" || ',' || ") + " || ']'"
      val outer = ring(Seq("x0" -> "y0", "x0+w" -> "y0", "x0+w" -> "y0+h",
        "x0" -> "y0+h", "x0" -> "y0"))
      val hole = ring(Seq("x0+2" -> "y0+2", "x0+4" -> "y0+2",
        "x0+4" -> "y0+4", "x0+2" -> "y0+4", "x0+2" -> "y0+2"))
      val part2 = ring(Seq("x0+100" -> "y0", "x0+105" -> "y0",
        "x0+105" -> "y0+5", "x0+100" -> "y0+5", "x0+100" -> "y0"))
      // re-serialize a parsed ring / the whole feature from the DOUBLE
      // lists (coords are integer-valued: cast back to BIGINT text)
      // single-line helpers: interpolated text must never start a line
      // with '|' or the OUTER stripMargin mangles it
      def rj(r: String) =
        s"'[' || array_to_string(list_transform($r, " +
          s"p -> '[' || CAST(CAST(p[1] AS BIGINT) AS VARCHAR) || ',' " +
          s"|| CAST(CAST(p[2] AS BIGINT) AS VARCHAR) || ']'), ',') || ']'"
      val rebuild =
        """'{"type":"Feature","properties":{"pid":' || CAST(jpid AS VARCHAR) """ +
          """|| '},"geometry":{"type":"MultiPolygon","coordinates":[' """ +
          "|| array_to_string(list_transform(polys, " +
          "pl -> '[' || array_to_string(list_transform(pl, " +
          s"rg -> ${rj("rg")}), ',') || ']'), ',') || ']}}'"
      s"""WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS pid FROM nation),
         |g AS (SELECT pid, pid*7%50 AS x0, pid*13%50 AS y0,
         |        10 + pid%5 AS w, 8 + pid%7 AS h FROM n),
         |feat AS (SELECT pid,
         |  '{"type":"Feature","properties":{"pid":' || CAST(pid AS VARCHAR)
         |  || '},"geometry":{"type":"MultiPolygon","coordinates":[['
         |  || $outer || ',' || $hole || '],[' || $part2 || ']]}}' AS orig
         |  FROM g),
         |raw AS (SELECT pid, orig,
         |  CASE WHEN pid % 7 = 3 THEN substr(orig, 1, 60) ELSE orig END AS gj
         |  FROM feat),
         |jv AS (SELECT pid, orig, gj, json_valid(gj) AS valid FROM raw),
         |px AS (SELECT pid, orig,
         |  json_extract_string(gj, '$$.type') AS ftype,
         |  json_extract_string(gj, '$$.geometry.type') AS gtype,
         |  CAST(json_extract(gj, '$$.properties.pid') AS BIGINT) AS jpid,
         |  TRY_CAST(json_extract(gj, '$$.geometry.coordinates')
         |    AS DOUBLE[][][][]) AS polys
         |  FROM jv WHERE valid),
         |pq AS (SELECT pid, orig, jpid, polys,
         |  (ftype = 'Feature' AND gtype = 'MultiPolygon'
         |   AND polys IS NOT NULL
         |   AND len(list_filter(polys, pl -> len(list_filter(pl, rg ->
         |     len(rg) < 4 OR rg[1][1] <> rg[len(rg)][1]
         |     OR rg[1][2] <> rg[len(rg)][2]
         |     OR len(list_filter(rg, p -> len(p) <> 2)) > 0)) > 0)) = 0)
         |    AS ok
         |  FROM px),
         |okr AS (SELECT pid, polys,
         |  (md5($rebuild) = md5(orig)) AS roundtrip
         |  FROM pq WHERE ok),
         |rr AS (SELECT pid, roundtrip, CAST(pi AS BIGINT) AS pi,
         |  CAST(ri AS BIGINT) AS ri, polys[CAST(pi AS INT)][CAST(ri AS INT)]
         |    AS ring
         |  FROM okr,
         |  LATERAL (SELECT unnest(generate_series(1, len(polys))) AS pi) a,
         |  LATERAL (SELECT unnest(generate_series(1,
         |    len(polys[CAST(pi AS INT)]))) AS ri) b),
         |calc AS (SELECT pid, roundtrip, pi, ri,
         |  list_transform(ring, p -> p[1]) AS xs,
         |  list_transform(ring, p -> p[2]) AS ys,
         |  CAST(len(ring) AS BIGINT) AS n_pts, ring
         |  FROM rr),
         |goodr AS (SELECT pid, TRUE AS parse_ok, roundtrip, pi, ri, n_pts,
         |  ROUND(ABS(list_sum(list_transform(range(1, CAST(n_pts AS INT)),
         |      i -> xs[i]*ys[i+1] - xs[i+1]*ys[i]))) / 2.0, 4) AS area,
         |  ROUND(list_sum(list_transform(range(1, CAST(n_pts AS INT)),
         |      i -> sqrt((xs[i+1]-xs[i])*(xs[i+1]-xs[i])
         |             + (ys[i+1]-ys[i])*(ys[i+1]-ys[i])))), 4) AS peri,
         |  ${rj("ring")} AS ring_json
         |  FROM calc),
         |badr AS (
         |  SELECT pid FROM jv WHERE NOT valid
         |  UNION ALL SELECT pid FROM pq WHERE NOT ok)
         |SELECT * FROM goodr
         |UNION ALL
         |SELECT pid, FALSE AS parse_ok, FALSE AS roundtrip,
         |  CAST(0 AS BIGINT) AS pi, CAST(0 AS BIGINT) AS ri,
         |  CAST(0 AS BIGINT) AS n_pts, 0.0 AS area, 0.0 AS peri,
         |  '' AS ring_json
         |FROM badr""".stripMargin
    },

    // GeoJSON kinds + FeatureCollection: the oracle rebuilds the same
    // 5 collection documents arithmetically (features sorted by pid,
    // region 2 truncated, pid%7==3 kinds replaced by 'Blob'), re-parses
    // them with DuckDB's JSON engine at BOTH levels (collection
    // validity, per-feature kind/arity/closure), and re-derives every
    // count/measure/roundtrip — a divergence in the Spark collection
    // framing, any kind's coordinate normalization, or the per-kind
    // writer breaks the hash
    "q_read_geojson_kinds" -> {
      def pos(x: String, y: String) =
        s"'[' || CAST($x AS VARCHAR) || ',' || CAST($y AS VARCHAR) || ']'"
      def ring(pts: Seq[(String, String)]) =
        "'[' || " + pts.map { case (x, y) => pos(x, y) }
          .mkString(" || ',' || ") + " || ']'"
      val outer = ring(Seq("x0" -> "y0", "x0+w" -> "y0", "x0+w" -> "y0+h",
        "x0" -> "y0+h", "x0" -> "y0"))
      val hole = ring(Seq("x0+2" -> "y0+2", "x0+4" -> "y0+2",
        "x0+4" -> "y0+4", "x0+2" -> "y0+4", "x0+2" -> "y0+2"))
      val part2 = ring(Seq("x0+100" -> "y0", "x0+105" -> "y0",
        "x0+105" -> "y0+5", "x0+100" -> "y0+5", "x0+100" -> "y0"))
      val lsRing = ring(Seq("x0" -> "y0", "x0+w" -> "y0", "x0+w" -> "y0+h"))
      // re-serialize from the parsed DOUBLE lists (integer-valued
      // coords -> BIGINT text); single-line helpers so stripMargin
      // never sees an interpolated leading '|'
      def rj(r: String) =
        s"'[' || array_to_string(list_transform($r, " +
          s"p -> '[' || CAST(CAST(p[1] AS BIGINT) AS VARCHAR) || ',' " +
          s"|| CAST(CAST(p[2] AS BIGINT) AS VARCHAR) || ']'), ',') || ']'"
      def pj(pl: String) =
        s"'[' || array_to_string(list_transform($pl, " +
          s"rg -> ${rj("rg")}), ',') || ']'"
      val coordsRebuild =
        s"CASE WHEN k = 'Point' THEN '[' " +
          s"|| CAST(CAST(c1[1] AS BIGINT) AS VARCHAR) || ',' " +
          s"|| CAST(CAST(c1[2] AS BIGINT) AS VARCHAR) || ']' " +
          s"WHEN k = 'LineString' THEN ${rj("c2")} " +
          s"WHEN k = 'Polygon' THEN ${pj("c3")} " +
          s"ELSE '[' || array_to_string(list_transform(c4, " +
          s"pl -> ${pj("pl")}), ',') || ']' END"
      val rebuild =
        """'{"type":"Feature","properties":{"pid":' || CAST(pq.pid AS VARCHAR) """ +
          """|| '},"geometry":{"type":"' || k || '","coordinates":' """ +
          s"|| $coordsRebuild || '}}'"
      val ringOk = "(rg -> len(rg) >= 4 AND rg[1][1] = rg[len(rg)][1] " +
        "AND rg[1][2] = rg[len(rg)][2] " +
        "AND len(list_filter(rg, p -> len(p) <> 2)) = 0)"
      val shoelace = "(rg -> ABS(list_sum(list_transform(" +
        "range(1, len(rg)), i -> rg[i][1]*rg[i+1][2] " +
        "- rg[i+1][1]*rg[i][2]))) / 2.0)"
      s"""WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS pid,
         |             CAST(n_regionkey AS BIGINT) AS rkey FROM nation),
         |g AS (SELECT pid, rkey, pid*7%50 AS x0, pid*13%50 AS y0,
         |        10 + pid%5 AS w, 8 + pid%7 AS h FROM n),
         |feat AS (SELECT pid, rkey,
         |  '{"type":"Feature","properties":{"pid":' || CAST(pid AS VARCHAR)
         |  || '},"geometry":{"type":"'
         |  || CASE WHEN pid % 7 = 3 THEN 'Blob'
         |       WHEN pid % 4 = 0 THEN 'Point'
         |       WHEN pid % 4 = 1 THEN 'LineString'
         |       WHEN pid % 4 = 2 THEN 'Polygon'
         |       ELSE 'MultiPolygon' END
         |  || '","coordinates":'
         |  || CASE WHEN pid % 4 = 0 THEN ${pos("x0", "y0")}
         |       WHEN pid % 4 = 1 THEN $lsRing
         |       WHEN pid % 4 = 2 THEN '[' || $outer || ',' || $hole || ']'
         |       ELSE '[[' || $outer || ',' || $hole || '],[' || $part2
         |         || ']]' END
         |  || '}}' AS f
         |  FROM g),
         |fcrow AS (SELECT rkey,
         |    '{"type":"FeatureCollection","features":['
         |    || string_agg(f, ',' ORDER BY pid) || ']}' AS fc_text
         |  FROM feat GROUP BY rkey),
         |raw AS (SELECT rkey, CASE WHEN rkey = 2
         |    THEN substr(fc_text, 1, 60) ELSE fc_text END AS gj
         |  FROM fcrow),
         |jv AS (SELECT rkey, gj,
         |    CASE WHEN json_valid(gj)
         |      THEN json_extract_string(gj, '$$.type')
         |             = 'FeatureCollection'
         |        AND json_extract(gj, '$$.features') IS NOT NULL
         |      ELSE FALSE END AS v
         |  FROM raw),
         |fcok AS (SELECT rkey, gj FROM jv WHERE v),
         |fx AS (SELECT rkey, CAST(u.i AS BIGINT) AS fi,
         |    json_extract(gj, '$$.features[' || u.i || ']') AS fj
         |  FROM fcok, LATERAL (SELECT unnest(generate_series(0,
         |    CAST(json_array_length(gj, '$$.features') AS INT) - 1)) AS i) u),
         |px AS (SELECT rkey, fi,
         |    json_extract_string(fj, '$$.type') AS ftype,
         |    json_extract_string(fj, '$$.geometry.type') AS k,
         |    CAST(json_extract(fj, '$$.properties.pid') AS BIGINT) AS pid,
         |    TRY_CAST(json_extract(fj, '$$.geometry.coordinates')
         |      AS DOUBLE[]) AS c1,
         |    TRY_CAST(json_extract(fj, '$$.geometry.coordinates')
         |      AS DOUBLE[][]) AS c2,
         |    TRY_CAST(json_extract(fj, '$$.geometry.coordinates')
         |      AS DOUBLE[][][]) AS c3,
         |    TRY_CAST(json_extract(fj, '$$.geometry.coordinates')
         |      AS DOUBLE[][][][]) AS c4
         |  FROM fx),
         |pq AS (SELECT *,
         |    (ftype = 'Feature' AND CASE
         |      WHEN k = 'Point' THEN c1 IS NOT NULL AND len(c1) = 2
         |      WHEN k = 'LineString' THEN c2 IS NOT NULL AND len(c2) >= 2
         |        AND len(list_filter(c2, p -> len(p) <> 2)) = 0
         |      WHEN k = 'Polygon' THEN c3 IS NOT NULL AND len(c3) >= 1
         |        AND len(list_filter(c3, $ringOk)) = len(c3)
         |      WHEN k = 'MultiPolygon' THEN c4 IS NOT NULL AND len(c4) >= 1
         |        AND len(list_filter(c4, pl -> len(pl) >= 1
         |          AND len(list_filter(pl, $ringOk)) = len(pl)))
         |          = len(c4)
         |      ELSE FALSE END) AS ok
         |  FROM px),
         |goodf AS (SELECT pq.rkey, fi, TRUE AS fc_ok, TRUE AS parse_ok,
         |    pq.pid, k AS kind,
         |    CAST(CASE WHEN k = 'MultiPolygon' THEN len(c4)
         |      ELSE 1 END AS BIGINT) AS n_parts,
         |    CAST(CASE WHEN k = 'Polygon' THEN len(c3)
         |      WHEN k = 'MultiPolygon' THEN list_sum(
         |        list_transform(c4, pl -> len(pl)))
         |      ELSE 1 END AS BIGINT) AS n_rings,
         |    CAST(CASE WHEN k = 'Point' THEN 1
         |      WHEN k = 'LineString' THEN len(c2)
         |      WHEN k = 'Polygon' THEN list_sum(
         |        list_transform(c3, rg -> len(rg)))
         |      ELSE list_sum(list_transform(c4, pl -> list_sum(
         |        list_transform(pl, rg -> len(rg))))) END AS BIGINT)
         |      AS n_pts,
         |    ROUND(CASE WHEN k = 'LineString' THEN list_sum(
         |        list_transform(range(1, len(c2)),
         |          i -> sqrt((c2[i+1][1]-c2[i][1])*(c2[i+1][1]-c2[i][1])
         |            + (c2[i+1][2]-c2[i][2])*(c2[i+1][2]-c2[i][2]))))
         |      ELSE 0.0 END, 4) AS length_r4,
         |    ROUND(CASE WHEN k = 'Polygon' THEN list_sum(
         |        list_transform(c3, $shoelace))
         |      WHEN k = 'MultiPolygon' THEN list_sum(list_transform(c4,
         |        pl -> list_sum(list_transform(pl, $shoelace))))
         |      ELSE 0.0 END, 4) AS area_r4,
         |    (md5($rebuild) = md5(ft.f)) AS roundtrip
         |  FROM pq JOIN feat ft ON ft.pid = pq.pid AND ft.rkey = pq.rkey
         |  WHERE ok),
         |badf AS (SELECT rkey, fi, TRUE AS fc_ok, FALSE AS parse_ok,
         |    CAST(-1 AS BIGINT) AS pid, '' AS kind,
         |    CAST(0 AS BIGINT) AS n_parts, CAST(0 AS BIGINT) AS n_rings,
         |    CAST(0 AS BIGINT) AS n_pts, 0.0 AS length_r4, 0.0 AS area_r4,
         |    FALSE AS roundtrip
         |  FROM pq WHERE NOT ok),
         |badfc AS (SELECT rkey, CAST(-1 AS BIGINT) AS fi, FALSE AS fc_ok,
         |    FALSE AS parse_ok, CAST(-1 AS BIGINT) AS pid, '' AS kind,
         |    CAST(0 AS BIGINT) AS n_parts, CAST(0 AS BIGINT) AS n_rings,
         |    CAST(0 AS BIGINT) AS n_pts, 0.0 AS length_r4, 0.0 AS area_r4,
         |    FALSE AS roundtrip
         |  FROM jv WHERE NOT v)
         |SELECT * FROM goodf
         |UNION ALL SELECT * FROM badf
         |UNION ALL SELECT * FROM badfc""".stripMargin
    },

    "q_read_wkt_multipolygon" -> {
      def pt(x: String, y: String) =
        s"CAST($x AS VARCHAR) || ' ' || CAST($y AS VARCHAR)"
      def ring(pts: Seq[(String, String)]) =
        "'(' || " + pts.map { case (x, y) => pt(x, y) }
          .mkString(" || ', ' || ") + " || ')'"
      val outer = ring(Seq("x0" -> "y0", "x0+w" -> "y0", "x0+w" -> "y0+h",
        "x0" -> "y0+h", "x0" -> "y0"))
      val hole = ring(Seq("x0+2" -> "y0+2", "x0+4" -> "y0+2",
        "x0+4" -> "y0+4", "x0+2" -> "y0+4", "x0+2" -> "y0+2"))
      val part2 = ring(Seq("x0+100" -> "y0", "x0+105" -> "y0",
        "x0+105" -> "y0+5", "x0+100" -> "y0+5", "x0+100" -> "y0"))
      s"""WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS pid FROM nation),
         |g AS (SELECT pid, pid*7%50 AS x0, pid*13%50 AS y0,
         |        10 + pid%5 AS w, 8 + pid%7 AS h FROM n),
         |wk AS (SELECT pid, 'MULTIPOLYGON ((' || $outer || ', ' || $hole
         |        || '), (' || $part2 || '))' AS wkt FROM g),
         |rings AS (
         |  SELECT pid, CAST(ri AS BIGINT) AS ri,
         |    regexp_extract_all(wkt, '\\(([^()]+)\\)', 1)[CAST(ri AS INT)]
         |      AS ring
         |  FROM wk, LATERAL (SELECT unnest(generate_series(1,
         |         len(regexp_extract_all(wkt, '\\(([^()]+)\\)', 1)))) AS ri) u),
         |parsed AS (
         |  SELECT pid, ri,
         |    list_transform(string_split(ring, ', '),
         |      p -> CAST(string_split(p, ' ')[1] AS DOUBLE)) AS xs,
         |    list_transform(string_split(ring, ', '),
         |      p -> CAST(string_split(p, ' ')[2] AS DOUBLE)) AS ys,
         |    CAST(len(string_split(ring, ', ')) AS BIGINT) AS n_pts
         |  FROM rings)
         |SELECT pid, ri, n_pts,
         |  ROUND(ABS(list_sum(list_transform(range(1, CAST(n_pts AS INT)),
         |      i -> xs[i]*ys[i+1] - xs[i+1]*ys[i]))) / 2.0, 4) AS area,
         |  ROUND(list_sum(list_transform(range(1, CAST(n_pts AS INT)),
         |      i -> sqrt((xs[i+1]-xs[i])*(xs[i+1]-xs[i])
         |             + (ys[i+1]-ys[i])*(ys[i+1]-ys[i])))), 4) AS peri,
         |  '(' || array_to_string(list_transform(range(1, CAST(n_pts AS INT)+1),
         |      i -> CAST(xs[i] AS VARCHAR) || ' ' || CAST(ys[i] AS VARCHAR)),
         |      ', ') || ')' AS ring_wkt
         |FROM parsed""".stripMargin
    },

    "q_read_wkt" ->
      """WITH w AS (
        |  SELECT CAST(event_id AS BIGINT) AS id,
        |    'POINT (' || CAST(event_id * 73 % 1000 AS VARCHAR) || ' '
        |      || CAST(event_id * 179 % 1000 AS VARCHAR) || ')' AS wkt
        |  FROM events)
        |SELECT id, wkt,
        |  CAST(regexp_extract(wkt, 'POINT \(([-0-9.]+) ([-0-9.]+)\)', 1)
        |    AS DOUBLE) / 10.0 AS px,
        |  CAST(regexp_extract(wkt, 'POINT \(([-0-9.]+) ([-0-9.]+)\)', 2)
        |    AS DOUBLE) / 10.0 AS py
        |FROM w""".stripMargin)
}
