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
  * stamps it post-write: each part file's row groups are appended
  * block-for-block (no decode, no re-encode — `ParquetFileWriter
  * .appendFile` copies compressed pages) into a replacement file whose
  * footer carries the original key-value metadata plus `geo`. Cost is one
  * sequential byte copy per file, embarrassingly parallel across files —
  * at 100 TB this is a per-file metadata rewrite, not a data job.
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
              bbox: Option[(Double, Double, Double, Double)]): String = {
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
    mapper.writeValueAsString(root)
  }

  /** Rewrite one parquet file with `geo` added to its footer key-value
    * metadata. Row groups are copied at the block level; schema, row
    * count, encodings and all pre-existing key-value entries (including
    * Spark's own schema key) are preserved. */
  def stampFile(file: Path, conf: Configuration, json: String): Unit = {
    val in = HadoopInputFile.fromPath(file, conf)
    val kv = new java.util.HashMap[String, String]()
    val schema = {
      val r = ParquetFileReader.open(in)
      try {
        val fmd = r.getFooter.getFileMetaData
        kv.putAll(fmd.getKeyValueMetaData)
        fmd.getSchema
      } finally r.close()
    }
    kv.put(GeoKey, json)
    val tmp = new Path(file.getParent, s".${file.getName}.geo.tmp")
    val w = new ParquetFileWriter(
      HadoopOutputFile.fromPath(tmp, conf), schema,
      ParquetFileWriter.Mode.OVERWRITE,
      org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE.toLong, 0)
    w.start()
    w.appendFile(in)
    w.end(kv)
    val fs = file.getFileSystem(conf)
    if (!fs.delete(file, false) || !fs.rename(tmp, file))
      throw new java.io.IOException(s"geo stamp: could not replace $file")
  }

  /** Stamp every part file of a Spark parquet output directory.
    * Returns the number of files stamped. */
  def stampDirectory(spark: SparkSession, dir: String,
                     primaryColumn: String = Pipeline.GeometryColumn,
                     geometryTypes: Seq[String] = Seq.empty,
                     bbox: Option[(Double, Double, Double, Double)] = None): Int = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val json = geoJson(primaryColumn, geometryTypes, bbox)
    val it = fs.listFiles(root, true)
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && name.endsWith(".parquet") && !name.startsWith(".") &&
          !name.startsWith("_")) {
        stampFile(f.getPath, conf, json)
        n += 1
      }
    }
    n
  }

  /** Read back the `geo` footer entry of the first part file (all part
    * files carry the same stamp). None if absent. */
  def readGeo(spark: SparkSession, dir: String): Option[String] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    var res: Option[String] = None
    while (res.isEmpty && it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && name.endsWith(".parquet") && !name.startsWith(".") &&
          !name.startsWith("_")) {
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try res = Option(r.getFooter.getFileMetaData.getKeyValueMetaData.get(GeoKey))
        finally r.close()
      }
    }
    res
  }

  /** Point-table bbox helper: (xmin, ymin, xmax, ymax) from lng/lat
    * columns in one narrow aggregate. */
  def bboxOfPoints(df: DataFrame, latCol: String, lngCol: String)
      : (Double, Double, Double, Double) = {
    val r = df.agg(min(col(lngCol)), min(col(latCol)),
                   max(col(lngCol)), max(col(latCol))).head()
    (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }
}
