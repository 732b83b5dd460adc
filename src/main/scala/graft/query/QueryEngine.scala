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

  private def plan(gated: SqlGate.Gated, sql: String, limit: Int): QueryResult = {
    gated.tables.foreach { t =>
      store.read(t).createOrReplaceTempView(t)
    }
    val df0 = store.spark.sql(sql)
    QueryResult(if (limit > 0) df0.limit(limit) else df0, gated.tables)
  }

  /** Validate + plan a query DataFrame (no execution yet). */
  def query(sql: String, limit: Int = 0): Either[String, QueryResult] =
    SqlGate.validate(store.spark, sql).map(plan(_, sql, limit))

  /** Execute and return JSON rows (reference returns a JSON array
    * string). Result-cached keyed on normalized SQL + table versions. */
  def executeJson(sql: String, limit: Int = 0, useCache: Boolean = true): Either[String, String] =
    SqlGate.validate(store.spark, sql).map { gated =>
      val k = cache.key(sql + s"|limit=$limit", gated.tables)
      val versions = gated.tables.map(t => t -> store.version(t)).toMap
      (if (useCache) cache.get(k, versions) else None).getOrElse {
        val json = plan(gated, sql, limit).df.toJSON.collect().mkString("[", ",", "]")
        if (useCache) cache.put(k, json, versions)
        json
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
