package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON side-input support (SURVEY.md §2.9 F10). The reference reads/writes
  * JSON maps for label dicts, embedding maps, and template maps
  * (logdeep/dataset/sample.py:13-16, dataset/data_loader.py:176-178,
  * dataset/hdfs_data_process.py:29-30). Spark-first expression:
  * `spark.read.json` with an EXPLICIT schema for files (inference would be
  * an extra full read, and digit-looking keys must stay strings),
  * `from_json`/`to_json` (codegen'd, no UDF) for JSON columns.
  */
object JsonSide {

  /** JSON-lines label dict ({"key": ..., "label": ...} per line) → the J1
    * broadcast-dim shape (hdfs_data_process.py:29-30's blockId→label dict).
    */
  def labelDict(spark: SparkSession, path: String,
                keyField: String = "key", labelField: String = "label"): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField(keyField, StringType), StructField(labelField, IntegerType))))
      .json(path)

  /** JSON-lines embedding map ({"key": ..., "vector": [...]}) —
    * sample.py:13-16's event→vector side input.
    */
  def embeddingDict(spark: SparkSession, path: String,
                    keyField: String = "key", vecField: String = "vector"): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField(keyField, StringType),
        StructField(vecField, ArrayType(DoubleType)))))
      .json(path)

  /** Parse a JSON-object column (one {"id": label, ...} dict per row) into
    * exploded (key, label) rows — the columnar form of the reference's
    * `json.load` → dict iteration.
    */
  def explodeLabelMap(df: DataFrame, jsonCol: Column): DataFrame =
    df.select(explode(from_json(jsonCol, MapType(StringType, IntegerType)))
      .as(Seq("key", "label")))

  /** Typed-struct parse of a JSON column; `ddl` is the struct schema in DDL
    * form (e.g. "conv STRING, label INT").
    */
  def parseStruct(jsonCol: Column, ddl: String): Column =
    from_json(jsonCol, StructType.fromDDL(ddl))
}
