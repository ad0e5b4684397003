package graft.catalog

import org.apache.spark.sql.SparkSession

/** One rule for every surface that addresses a manifest table by a
  * STRING — the V1 source's `path` option (batch and streaming), the
  * `graft_changes`/`graft_history`/`graft_detail` TVFs, the CDC
  * follower sink: the string may be a PATH (anything containing the
  * path separator, which catalog names can never contain) or a fully
  * qualified `catalog.namespace.table` NAME registered in a
  * [[GraftCatalog]] on the active session. A user who just created
  * `graftcat.db.docs` by name never has to go find its path to
  * follow its change feed.
  *
  * Resolution is deliberately conservative: a separator-free string
  * resolves through a catalog ONLY when its first segment names a
  * session catalog that IS a GraftCatalog and the ref exists —
  * otherwise the string passes through unchanged as a (relative)
  * path, so no existing path-addressed call changes meaning. A
  * matching catalog with a MISSING table is loud, never treated as a
  * path: the user clearly meant the name. */
object GraftNames {

  def resolve(spark: SparkSession, ref: String): String = {
    if (ref.contains("/") || ref.contains(java.io.File.separator))
      return ref
    val parts = ref.split('.')
    if (parts.length < 3) return ref // a name needs catalog.ns.table
    val cat =
      try spark.sessionState.catalogManager.catalog(parts.head)
      catch { case _: Exception => return ref } // not a session catalog
    cat match {
      case g: GraftCatalog => g.resolveTablePath(parts.tail.mkString("."))
      case _ => ref
    }
  }
}
