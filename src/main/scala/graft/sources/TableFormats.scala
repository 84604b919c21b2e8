package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** CSV/JSON/ORC source support for every table (SURVEY §2 C14).
  *
  * Text formats carry no types, so each table has a literal DDL schema —
  * identical to what the parquet layout yields under the session's
  * nanosAsLong read (events.ts stays long nanoseconds). Columns that text
  * formats cannot hold natively (embeddings' array<float> in CSV) are
  * JSON-encoded on export and decoded on load, so every operator sees the
  * same shapes regardless of the storage format. ORC (round 13) is a
  * typed columnar format, so it flows through the same paths with no
  * re-encoding — the DDL schema acts as the read contract exactly as for
  * parquet, and the header/escape writer options are inert no-ops there.
  */
object TableFormats {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Literal schemas matching the driver parquet under nanosAsLong. */
  val schemas: Map[String, String] = Map(
    "region" -> "r_regionkey INT, r_name STRING",
    "nation" -> "n_nationkey INT, n_name STRING, n_regionkey INT",
    "customer" -> ("c_custkey BIGINT, c_name STRING, c_nationkey INT, " +
      "c_acctbal DOUBLE, c_mktsegment STRING"),
    "supplier" -> "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE",
    "part" -> ("p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, " +
      "p_size INT, p_retailprice DOUBLE"),
    "orders" -> ("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
      "o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"),
    "lineitem" -> ("l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, " +
      "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, " +
      "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, " +
      "l_linestatus STRING, l_shipdate TIMESTAMP_NTZ"),
    "events" -> ("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING"),
    "documents" -> "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    "embeddings" -> "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")

  private def isCsvHostile(ddl: String): Boolean = ddl.contains("ARRAY<")

  /** Write every table of `t` under `dir/<name>` in `format` (csv|json).
    * CSV JSON-encodes array columns. */
  def exportTables(t: Tables, dir: String, format: String): Unit =
    tableNames.foreach { name =>
      val df = table(t, name)
      val out =
        if (format == "csv" && isCsvHostile(schemas(name)))
          df.schema.fields.foldLeft(df) { (d, f) =>
            if (f.dataType.isInstanceOf[ArrayType]) d.withColumn(f.name, to_json(col(f.name)))
            else d
          }
        else df
      out.write.mode("overwrite")
        .option("header", "true")
        // RFC-4180 quoting: document text / JSON props carry quotes,
        // commas, and newlines
        .option("escape", "\"")
        .format(format).save(s"$dir/$name")
    }

  /** Tables over a CSV/JSON directory written by [[exportTables]] — full
    * schema fidelity, so the whole SparkEntry catalog runs unchanged on
    * text sources. */
  def loadTables(spark: SparkSession, dir: String, format: String): Tables =
    Tables.fromLoader { name =>
      val ddl = schemas(name)
      if (format == "csv" && isCsvHostile(ddl)) {
        // read array columns as JSON strings, then decode
        val textDdl = ddl.replaceAll("ARRAY<FLOAT>", "STRING")
        val raw = reader(spark, format).schema(textDdl).load(s"$dir/$name")
        val target = org.apache.spark.sql.types.StructType.fromDDL(ddl)
        target.fields.foldLeft(raw) { (d, f) =>
          if (f.dataType == ArrayType(FloatType))
            d.withColumn(f.name, from_json(col(f.name), f.dataType))
          else d
        }
      } else
        reader(spark, format).schema(ddl).load(s"$dir/$name")
    }

  private def reader(spark: SparkSession, format: String) = {
    val r = spark.read.option("header", "true").format(format)
    if (format == "csv") r.option("escape", "\"").option("multiLine", "true")
    else r
  }

  private def table(t: Tables, name: String): DataFrame = name match {
    case "region" => t.region
    case "nation" => t.nation
    case "customer" => t.customer
    case "supplier" => t.supplier
    case "part" => t.part
    case "orders" => t.orders
    case "lineitem" => t.lineitem
    case "events" => t.events
    case "documents" => t.documents
    case "embeddings" => t.embeddings
  }
}
