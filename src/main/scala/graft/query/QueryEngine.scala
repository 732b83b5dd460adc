package graft.query

import org.apache.spark.sql.DataFrame

import graft.catalog.TableStore

/** SQL query execution over a [[TableStore]] — the Spark shape of the
  * reference's `Querier.ExecuteQuery` (`internal/query/query.go:277-375`).
  *
  * Lifecycle (vs SURVEY.md §3.1): validate → extract tables → cache
  * lookup → register temp views (hybrid buffer∪storage read; Catalyst
  * does all pruning the reference hand-rolled) → `spark.sql` → encode →
  * cache store. LIMIT injection and cursor pagination mirror
  * `miniodb_service.go:624-626` / `StreamQuery` (`:1276-1377`). */
class QueryEngine(store: TableStore, cache: ResultCache = new ResultCache()) {

  final case class QueryResult(df: DataFrame, tables: Seq[String])

  /** Register views for the referenced names this store actually knows
    * (known = created/written table or existing storage). Unknown names
    * stay unresolved: a CTE reference resolves to its CTE, a typo'd
    * table fails analysis with TABLE_OR_VIEW_NOT_FOUND instead of
    * silently reading as empty. Returns the known (registered) names —
    * the cache-invalidation key set. */
  private def plan(gated: SqlGate.Gated, sql: String, limit: Int): Either[String, QueryResult] = {
    val known = gated.tables.filter(t => store.listTables().contains(t) ||
      new java.io.File(store.tablePath(t)).isDirectory)
    known.foreach { t => store.read(t).createOrReplaceTempView(t) }
    scala.util.Try(store.spark.sql(sql)) match {
      case scala.util.Success(df0) =>
        Right(QueryResult(if (limit > 0) df0.limit(limit) else df0, known))
      case scala.util.Failure(e) => Left(s"analysis error: ${e.getMessage}")
    }
  }

  /** Validate + plan a query DataFrame (no execution yet). */
  def query(sql: String, limit: Int = 0): Either[String, QueryResult] =
    SqlGate.validate(store.spark, sql).flatMap(plan(_, sql, limit))

  /** Execute and return JSON rows (reference returns a JSON array
    * string). Result-cached keyed on exact SQL + table versions.
    * Runtime failures come back as Left, never as thrown exceptions. */
  def executeJson(sql: String, limit: Int = 0, useCache: Boolean = true): Either[String, String] =
    SqlGate.validate(store.spark, sql).flatMap { gated =>
      plan(gated, sql, limit).flatMap { qr =>
        val k = cache.key(sql + s"|limit=$limit", qr.tables)
        val versions = qr.tables.map(t => t -> store.version(t)).toMap
        (if (useCache) cache.get(k, versions) else None) match {
          case Some(hit) => Right(hit)
          case None =>
            scala.util.Try(qr.df.toJSON.collect().mkString("[", ",", "]")) match {
              case scala.util.Success(json) =>
                if (useCache) cache.put(k, json, versions)
                Right(json)
              case scala.util.Failure(e) => Left(s"execution error: ${e.getMessage}")
            }
        }
      }
    }

  /** Cursor pagination for server-streaming results (StreamQuery):
    * executes the plan, returns `pageSize` rows from `cursor` plus the
    * next cursor (-1 when exhausted). */
  def executePage(sql: String, cursor: Long, pageSize: Int): Either[String, (Array[String], Long)] =
    query(sql).map { qr =>
      // limit+offset via plan (no full collect): order is the query's own
      val page = qr.df.offset(cursor.toInt).limit(pageSize + 1).toJSON.collect()
      if (page.length > pageSize) (page.take(pageSize), cursor + pageSize)
      else (page, -1L)
    }

  def cacheStats: (Long, Long, Int, Long) = cache.stats
}
