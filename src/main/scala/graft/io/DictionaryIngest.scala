package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dictionary-driven CSV ingestion (SURVEY.md §2.1 S6 + §2.7 D10): the
  * reference stages auxiliary NYC datasets as CSV files accompanied by
  * data-dictionary CSVs (`dict_*.csv` with column_name/type rows) and a
  * prose schema-evolution playbook ("same columns -> rename; new
  * columns -> drop & recreate"). Here that becomes:
  *
  *  - [[schemaFromDictionary]]: dictionary rows -> explicit StructType
  *    (never autodetect on dirty civic CSVs)
  *  - [[readWithDictionary]]: schema'd CSV read, malformed rows
  *    preserved in a corrupt-record column for quarantine
  *  - [[applyRenames]]: the "same columns, new names" evolution step as
  *    a data-driven rename map (the D10 playbook's cheap path)
  */
object DictionaryIngest {

  /** Map the dictionary's type vocabulary onto Spark types. The
    * reference dictionaries use loose names (STRING, NUMBER, Plain
    * Text, Date...); unknown types conservatively land on String. */
  def toSparkType(t: String): DataType = t.trim.toLowerCase match {
    case "string" | "text" | "plain text" | "varchar" => StringType
    case "integer" | "int" | "long" | "bigint" | "number" => LongType
    case "double" | "float" | "real" => DoubleType
    case "decimal" | "numeric" => DecimalType(38, 9) // BigQuery NUMERIC
    case "date" => DateType
    case "timestamp" | "datetime" | "date & time" => TimestampType
    case "boolean" | "bool" | "checkbox" => BooleanType
    case _ => StringType
  }

  /** Build a schema from a dictionary relation with columns
    * (column_name, type). Order of dictionary rows = column order. */
  def schemaFromDictionary(dict: Seq[(String, String)]): StructType =
    StructType(dict.map { case (name, t) =>
      StructField(name, toSparkType(t), nullable = true)
    })

  /** Read a dictionary CSV (header `column_name,type[,...]`). */
  def readDictionary(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.option("header", "true").csv(path)
      .select(col("column_name"), col("type"))
      .collect()  // dictionaries are tens of rows — driver-side is correct
      .map(r => (r.getString(0), r.getString(1))).toSeq

  /** Schema'd CSV read with quarantine: malformed rows keep their raw
    * text in `_corrupt_record` instead of silently nulling (PERMISSIVE),
    * so a 100 TB ingest can split good/bad rows in one pass. */
  def readWithDictionary(spark: SparkSession, dataPath: String,
                         dict: Seq[(String, String)]): DataFrame = {
    val schema = schemaFromDictionary(dict)
      .add(StructField("_corrupt_record", StringType, nullable = true))
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema)
      .csv(dataPath)
  }

  /** D10 "same columns, renamed" evolution: apply a {old -> new} rename
    * map; columns absent from the map pass through unchanged. */
  def applyRenames(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.select(df.columns.map(c => col(c).as(renames.getOrElse(c, c))): _*)
}
