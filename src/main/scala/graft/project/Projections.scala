package graft.project

import graft.config.{EntitySpec, ProjectionSpec}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Projections: arbitrary user SQL over the staged entity
  * (reference main.py:234-298).
  *
  * The reference textually rewrites the query (`replace(entity,
  * f"{entity}_stage")`, main.py:251,284) to point at the stage table;
  * we instead register the stage DataFrame *under the entity name*, so
  * user SQL runs unmodified — identical observable behavior for every
  * valid config, minus the substring-surgery corruption modes
  * (SURVEY.md §7 risk 7). Catalyst parses/optimizes the SQL; a `table`
  * projection is materialized with cache(), a `view` stays lazy —
  * mirroring CTAS vs CREATE VIEW.
  *
  * Aliases are applied structurally (withColumnRenamed) after
  * validating the original column against the entity schema; an unknown
  * alias key warns and skips the projection (main.py:254-258,287-291),
  * as does a failing query (main.py:263-265,296-298).
  */
object Projections {

  final case class ProjectionResult(spec: ProjectionSpec, df: DataFrame)

  def run(
      spark: SparkSession,
      stage: DataFrame,
      spec: EntitySpec,
      warn: String => Unit = msg => System.err.println(msg)): Seq[ProjectionResult] = {
    stage.createOrReplaceTempView(spec.name)
    val schemaNames = spec.fields.map(_.name).toSet
    spec.projections.flatMap { proj =>
      if (proj.projType != "view" && proj.projType != "table") {
        warn(s"Skipping unsupported projection type '${proj.projType}' for projection '${proj.name}'.")
        None
      } else if (proj.query.trim.isEmpty) {
        warn(s"Warning: No query defined for ${proj.projType} '${proj.name}' in table '${spec.name}'. Skipping.")
        None
      } else {
        val badAlias = proj.aliases.keys.find(orig => !schemaNames.contains(orig))
        if (badAlias.isDefined) {
          warn(s"Error in ${proj.projType} '${proj.name}' for table '${spec.name}': " +
            s"Field '${badAlias.get}' in aliases is not defined in the schema. Skipping.")
          None
        } else {
          try {
            val base = spark.sql(proj.query)
            val renamed = proj.aliases.foldLeft(base) { case (df, (orig, alias)) =>
              df.withColumnRenamed(orig, alias)
            }
            val result = if (proj.projType == "table") renamed.cache() else renamed
            result.createOrReplaceTempView(proj.name)
            Some(ProjectionResult(proj, result))
          } catch {
            case e: Exception =>
              warn(s"Failed to create ${proj.projType} '${proj.name}': ${e.getMessage}")
              None
          }
        }
      }
    }
  }
}
