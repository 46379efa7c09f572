package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoParquet footer metadata (the `geo` key-value entry of the public
  * GeoParquet spec, v1.1.0) for the engine's parquet sinks.
  *
  * The reference's durable interchange format is GeoParquet: every
  * `convert_*_to_parquet` output is written with spec metadata (via
  * rq_geo_toolkit / DuckDB COPY, `overturemaestro/data_downloader.py:11-12,
  * 221-255`) and read back with `geopandas.read_parquet`
  * (`overturemaestro/geopandas_io.py:12-28`), which requires the `geo`
  * footer entry to locate the primary geometry column. Spark's parquet
  * writer cannot attach arbitrary footer key-value metadata, so this
  * stamps it post-write, copying row groups chunk-by-chunk at the byte
  * level (no decode, no re-encode) WITH their page indexes
  * (ColumnIndex/OffsetIndex) and bloom filters — the Hilbert-sorted
  * sink's page-level pruning survives the rewrite. Cost is one
  * sequential byte copy per file; `stampDirectory` distributes the files
  * across the cluster as a Spark job, so at 100 TB this is a
  * per-file-parallel metadata rewrite, not a driver loop.
  */
object GeoParquetMeta {

  final val GeoKey = "geo"
  final val SpecVersion = "1.1.0"

  private val mapper = new ObjectMapper()

  /** Build the spec JSON. `bbox` is (xmin, ymin, xmax, ymax) in lon/lat.
    * CRS is omitted ⇒ OGC:CRS84 per spec — the reference's EPSG:4326
    * lon/lat convention (`overturemaestro/geopandas_io.py:23`). */
  def geoJson(primaryColumn: String,
              geometryTypes: Seq[String],
              bbox: Option[(Double, Double, Double, Double)],
              coveringColumn: Option[String] = None): String = {
    val root = mapper.createObjectNode()
    root.put("version", SpecVersion)
    root.put("primary_column", primaryColumn)
    val cols = root.putObject("columns")
    val geom = cols.putObject(primaryColumn)
    geom.put("encoding", "WKB")
    val types = geom.putArray("geometry_types")
    geometryTypes.foreach(types.add)
    bbox.foreach { case (xmin, ymin, xmax, ymax) =>
      val b = geom.putArray("bbox")
      b.add(xmin); b.add(ymin); b.add(xmax); b.add(ymax)
    }
    // GeoParquet 1.1 `covering`: names the per-row bbox struct column
    // whose leaf min/max statistics let ANY parquet reader prune row
    // groups spatially (the spec's ["column", "field"] path encoding)
    coveringColumn.foreach { c =>
      val cov = geom.putObject("covering").putObject("bbox")
      Seq("xmin", "ymin", "xmax", "ymax").foreach { f =>
        val a = cov.putArray(f); a.add(c); a.add(f)
      }
    }
    mapper.writeValueAsString(root)
  }

  /** Rewrite one parquet file with `geo` added to its footer key-value
    * metadata. Column chunks are copied at the byte level together with
    * their ColumnIndex/OffsetIndex/bloom filters; schema, row count and
    * all pre-existing key-value entries (including Spark's own schema
    * key) are preserved.
    *
    * Replace semantics: on a local filesystem the swap is a single
    * `Files.move(ATOMIC_MOVE|REPLACE_EXISTING)` — the data is never
    * absent under its real name. On filesystems without atomic replace
    * (object stores) the two-rename fallback has a small window where
    * the file exists only as `.name.geo.bak`; `recoverOrphans` (run by
    * `partFiles` before every directory stamp/read) restores such
    * leftovers, so a crash in the window is repaired on the next pass
    * instead of silently dropping the file. */
  def stampFile(file: Path, conf: Configuration, json: String): Unit = {
    val in = HadoopInputFile.fromPath(file, conf)
    val tmp = new Path(file.getParent, s".${file.getName}.geo.tmp")
    val reader = ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val fmd = footer.getFileMetaData
      val schema = fmd.getSchema
      val kv = new java.util.HashMap[String, String](fmd.getKeyValueMetaData)
      kv.put(GeoKey, json)
      val w = new ParquetFileWriter(
        HadoopOutputFile.fromPath(tmp, conf), schema,
        ParquetFileWriter.Mode.OVERWRITE,
        org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong, 0)
      w.start()
      val stream = in.newStream()
      try {
        footer.getBlocks.forEach { block =>
          w.startBlock(block.getRowCount)
          block.getColumns.forEach { c =>
            w.appendColumnChunk(
              schema.getColumnDescription(c.getPath.toArray), stream, c,
              reader.readBloomFilter(c),
              reader.readColumnIndex(c),
              reader.readOffsetIndex(c))
          }
          w.endBlock()
        }
      } finally stream.close()
      w.end(kv)
    } finally reader.close()
    val fs = file.getFileSystem(conf)
    if (fs.getUri.getScheme == "file") {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val dir = Paths.get(file.getParent.toUri.getPath)
      // Hadoop's local FS is a ChecksumFileSystem: each file has a hidden
      // `.name.crc` sidecar. The nio move bypasses Hadoop, so swap the
      // sidecar by hand — drop the stale one BEFORE the data swap (a crash
      // then leaves a crc-less but readable file, never a mismatched one)
      // and promote tmp's sidecar after (checksums are content-addressed,
      // so it stays valid for the moved bytes).
      val dstCrc = dir.resolve(s".${file.getName}.crc")
      val tmpCrc = dir.resolve(s".${tmp.getName}.crc")
      Files.deleteIfExists(dstCrc)
      Files.move(
        Paths.get(tmp.toUri.getPath), Paths.get(file.toUri.getPath),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      if (Files.exists(tmpCrc))
        Files.move(tmpCrc, dstCrc, StandardCopyOption.REPLACE_EXISTING)
    } else {
      val bak = new Path(file.getParent, s".${file.getName}.geo.bak")
      fs.delete(bak, false)
      if (!fs.rename(file, bak))
        throw new java.io.IOException(s"geo stamp: could not move $file aside")
      if (!fs.rename(tmp, file)) {
        fs.rename(bak, file) // restore; original was never lost
        throw new java.io.IOException(s"geo stamp: could not replace $file")
      }
      fs.delete(bak, false)
    }
  }

  /** Repair leftovers of a crash inside stampFile's non-atomic fallback
    * window: a `.name.geo.bak` whose real `name` is missing is the
    * original file moved aside — restore it; stray `.geo.tmp` files are
    * incomplete rewrites — drop them. Idempotent, cheap (one listing). */
  private def recoverOrphans(fs: org.apache.hadoop.fs.FileSystem, root: Path): Unit = {
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val p = it.next().getPath
      val n = p.getName
      if (n.startsWith(".") && n.endsWith(".geo.bak")) {
        val real = new Path(p.getParent, n.stripPrefix(".").stripSuffix(".geo.bak"))
        if (!fs.exists(real)) fs.rename(p, real) else fs.delete(p, false)
      } else if (n.startsWith(".") &&
                 (n.endsWith(".geo.tmp") || n.endsWith(".geo.tmp.crc") ||
                  n.endsWith(".geo.bak.crc"))) {
        fs.delete(p, false)
      }
    }
  }

  private def partFiles(spark: SparkSession, dir: String): (Configuration, Seq[Path]) = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    recoverOrphans(fs, root)
    val it = fs.listFiles(root, true)
    val out = scala.collection.mutable.ArrayBuffer[Path]()
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && name.endsWith(".parquet") && !name.startsWith(".") &&
          !name.startsWith("_")) out += f.getPath
    }
    (conf, out.toSeq)
  }

  /** Stamp every part file of a Spark parquet output directory, one Spark
    * task per file (the per-file byte copy is embarrassingly parallel and
    * executor-local-read friendly). Returns the number of files stamped. */
  def stampDirectory(spark: SparkSession, dir: String,
                     primaryColumn: String = Pipeline.GeometryColumn,
                     geometryTypes: Seq[String] = Seq.empty,
                     bbox: Option[(Double, Double, Double, Double)] = None,
                     coveringColumn: Option[String] = None): Int = {
    val (conf, files) = partFiles(spark, dir)
    if (files.isEmpty) return 0
    val json = geoJson(primaryColumn, geometryTypes, bbox, coveringColumn)
    // ship the session's Hadoop conf as plain pairs (Configuration itself
    // is not serializable) and overlay it on executor-side defaults
    import scala.jdk.CollectionConverters._
    val confPairs = conf.iterator().asScala.map(e => e.getKey -> e.getValue).toArray
    val sc = spark.sparkContext
    val paths = files.map(_.toString)
    sc.parallelize(paths, math.min(paths.size, sc.defaultParallelism))
      .foreach { p =>
        val c = new Configuration()
        confPairs.foreach { case (k, v) => c.set(k, v) }
        stampFile(new Path(p), c, json)
      }
    paths.size
  }

  /** Read back the `geo` footer entry of the first part file (all part
    * files carry the same stamp). None if absent. */
  def readGeo(spark: SparkSession, dir: String): Option[String] = {
    val (conf, files) = partFiles(spark, dir)
    files.headOption.flatMap { p =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try Option(r.getFooter.getFileMetaData.getKeyValueMetaData.get(GeoKey))
      finally r.close()
    }
  }

  /** Bbox of a WKB geometry column — (xmin, ymin, xmax, ymax) in one
    * narrow aggregate (envelope computed once per row). None when the
    * input has no non-null geometry (empty results stay stampable: the
    * spec makes `bbox` optional). */
  def bboxOfGeometry(df: DataFrame,
                     geomCol: String = Pipeline.GeometryColumn)
      : Option[(Double, Double, Double, Double)] = {
    val r = df.where(col(geomCol).isNotNull)
      .select(graft.functions.GeomConstructors.geom_envelope(col(geomCol)).as("_e"))
      .agg(min(col("_e.xmin")), min(col("_e.ymin")),
           max(col("_e.xmax")), max(col("_e.ymax")))
      .head()
    if (r.isNullAt(0)) None
    else Some((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
  }

  /** Point-table bbox helper: (xmin, ymin, xmax, ymax) from lng/lat
    * columns in one narrow aggregate; None on an empty input. */
  def bboxOfPoints(df: DataFrame, latCol: String, lngCol: String)
      : Option[(Double, Double, Double, Double)] = {
    val r = df.agg(min(col(lngCol)), min(col(latCol)),
                   max(col(lngCol)), max(col(latCol))).head()
    if (r.isNullAt(0)) None
    else Some((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
  }
}
