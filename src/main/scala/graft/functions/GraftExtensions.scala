package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.StringType

/** Session extension registering graft's native expressions as SQL
  * functions, so the SQL front door can call them exactly like the
  * Column API does:
  *
  *   `SELECT md5long56(text), dot_long(qa, qb) FROM ...`
  *
  * Wire-up: `GraftSession.builder` applies it via `withExtensions`;
  * external users can instead set
  * `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * standard deployment path on a shared cluster where the session is
  * built by the platform, not the library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("md5long56"),
      new ExpressionInfo(classOf[Md5Long56].getName, "md5long56"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "md5long56 expects one argument")
        Md5Long56(Cast(args.head, StringType))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotLong].getName, "dot_long"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_long expects two arguments")
        DotLong(args(0), args(1))
      }))
    // SQL MERGE INTO on graft-manifest tables: route the canonical
    // upsert shape to the sink's (stats-narrowed) copy-on-write merge
    // instead of implementing the generic row-level-ops framework
    ext.injectResolutionRule(spark =>
      new graft.sources.ManifestMergeRule(spark))
    // CHANGE FEED as a SQL table function (Delta's table_changes):
    //   SELECT * FROM graft_table_changes('t', 1, 5)
    // — rows that became (in)visible in (v1, v2], tagged with
    // _change_type/_commit_version (graft.sources.ManifestCdf). The
    // table argument resolves under the graft catalog root, or is
    // taken as a literal directory when absolute.
    ext.injectTableFunction((
      FunctionIdentifier("graft_table_changes"),
      new ExpressionInfo("graft.sources.ManifestCdf",
        "graft_table_changes"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_table_changes(table, from_version, to_version)")
        def lit(e: Expression): Any = {
          require(e.foldable,
            s"graft_table_changes arguments must be literals, got $e")
          e.eval()
        }
        val name = String.valueOf(lit(args(0)))
        def asInt(a: Any): Int = a match {
          case n: java.lang.Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"graft_table_changes: integer version expected, got $other")
        }
        val spark = org.apache.spark.sql.SparkSession.active
        val dir =
          if (name.startsWith("/")) name
          else spark.conf.getOption("spark.sql.catalog.graft.root")
            .map(r => s"$r/$name").getOrElse(name)
        graft.sources.ManifestCdf.readChanges(spark, dir,
          asInt(lit(args(1))), asInt(lit(args(2))))
          .queryExecution.analyzed
      }))
  }
}
