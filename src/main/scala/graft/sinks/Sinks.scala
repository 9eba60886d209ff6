package graft.sinks

import graft.ingest.CsvIngest.RowId
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** CSV sinks matching the reference's output layout:
  * `output/exports/{name}.csv` per projection (main.py:300-326) and
  * `output/errors/{entity}_{type}_errors.csv` per error set
  * (main.py:367-399).
  *
  * `singleFile=true` reproduces the reference's one-file-per-projection
  * layout via coalesce(1) + rename — the right call for an export the
  * size a config-driven import handles. At cluster scale flip it off:
  * the writer then emits a standard sharded directory `{name}.csv/`
  * with no single-node merge bottleneck.
  */
object Sinks {

  def exportProjection(df: DataFrame, name: String, outputDir: String,
      singleFile: Boolean = true): String =
    writeCsv(ordered(df), s"$outputDir/exports", s"$name.csv", singleFile)

  /** save_errors parity: an `errors` array column is flattened to a
    * "; "-joined string (main.py:391); rows ordered by the original
    * row id when present.
    */
  def saveErrors(df: DataFrame, errorType: String, entity: String, outputDir: String,
      singleFile: Boolean = true): Option[String] = {
    if (df.isEmpty) None
    else {
      val flat = df.schema.find(_.name == "errors") match {
        case Some(f) if f.dataType.typeName == "array" =>
          df.withColumn("errors", concat_ws("; ", col("errors")))
        case _ => df
      }
      Some(writeCsv(ordered(flat), s"$outputDir/errors", s"${entity}_${errorType}_errors.csv", singleFile))
    }
  }

  private def ordered(df: DataFrame): DataFrame =
    if (df.columns.contains(RowId)) df.orderBy(col(RowId))
    else if (df.columns.contains("row")) df.orderBy(col("row"))
    else df

  private def writeCsv(df: DataFrame, dir: String, fileName: String, singleFile: Boolean): String = {
    Files.createDirectories(Paths.get(dir))
    val target = s"$dir/$fileName"
    if (!singleFile) {
      df.write.mode("overwrite").option("header", "true").csv(target)
      target
    } else {
      val tmp = s"$dir/.tmp_$fileName"
      df.coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
      val part = Files.list(Paths.get(tmp)).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-"))
        .getOrElse(throw new IllegalStateException(s"no part file written under $tmp"))
      Files.move(part, Paths.get(target), StandardCopyOption.REPLACE_EXISTING)
      // clean the temp dir (part metadata, _SUCCESS)
      Files.walk(Paths.get(tmp)).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      target
    }
  }
}
