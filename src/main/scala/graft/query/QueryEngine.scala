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

  // views registered by ANY QueryEngine on this session — the only ones
  // an engine may drop (removing arbitrary session views for unknown
  // names would destroy views owned by other components). Session-global
  // so a new engine instance still cleans up a predecessor's stale view
  // for a since-dropped table; weak keys die with the session.
  private val ownedViews = QueryEngine.ownedViewsFor(store.spark)

  /** Register views for the referenced names this store actually knows
    * (registered table or existing storage — checked via the store's
    * Hadoop FS, so non-local roots work). For referenced names the store
    * does NOT know, any session temp view left by an earlier query (e.g.
    * for a since-dropped table) is removed, so a stale view can never
    * resolve — a typo'd/dropped table fails analysis with
    * TABLE_OR_VIEW_NOT_FOUND instead of serving old data. */
  private def plan(gated: SqlGate.Gated, sql: String, limit: Int): Either[String, QueryResult] = {
    val (known, unknown) = gated.tables.partition(store.knownTable)
    // stale views for since-dropped tables: drop only views WE created
    unknown.filter(ownedViews.contains).foreach { t =>
      store.spark.catalog.dropTempView(t); ownedViews.remove(t)
    }
    scala.util.Try {
      known.foreach { t =>
        store.read(t).createOrReplaceTempView(t); ownedViews.put(t, ())
      }
      store.spark.sql(sql)
    } match {
      case scala.util.Success(df0) =>
        Right(QueryResult(if (limit > 0) df0.limit(limit) else df0, known))
      case scala.util.Failure(e) => Left(s"analysis error: ${e.getMessage}")
    }
  }

  /** Validate + plan a query DataFrame (no execution yet). */
  def query(sql: String, limit: Int = 0): Either[String, QueryResult] =
    SqlGate.validate(store.spark, sql).flatMap(plan(_, sql, limit))

  /** Execute and return JSON rows (reference returns a JSON array
    * string). Result-cached keyed on exact SQL + table versions; the
    * cache probe happens BEFORE any planning (a hit must not pay view
    * registration / parquet schema listing). Runtime failures come back
    * as Left, never as thrown exceptions. */
  def executeJson(sql: String, limit: Int = 0, useCache: Boolean = true): Either[String, String] =
    SqlGate.validate(store.spark, sql).flatMap { gated =>
      val known = gated.tables.filter(store.knownTable)
      val k = cache.key(sql + s"|limit=$limit", known)
      val versions = known.map(t => t -> store.version(t)).toMap
      (if (useCache && known.nonEmpty) cache.get(k, versions) else None) match {
        case Some(hit) => Right(hit)
        case None =>
          plan(gated, sql, limit).flatMap { qr =>
            scala.util.Try(qr.df.toJSON.collect().mkString("[", ",", "]")) match {
              case scala.util.Success(json) =>
                // only table-backed results are cacheable: with no known
                // tables the version map is empty and the entry could
                // never be invalidated
                if (useCache && known.nonEmpty) cache.put(k, json, versions)
                Right(json)
              case scala.util.Failure(e) => Left(s"execution error: ${e.getMessage}")
            }
          }
      }
    }

  /** Cursor pagination for server-streaming results (StreamQuery):
    * executes the plan, returns `pageSize` rows from `cursor` plus the
    * next cursor (-1 when exhausted). */
  def executePage(sql: String, cursor: Long, pageSize: Int): Either[String, (Array[String], Long)] = {
    if (cursor < 0 || cursor > Int.MaxValue)
      return Left(s"invalid cursor $cursor (must be in [0, ${Int.MaxValue}])")
    query(sql).flatMap { qr =>
      // limit+offset via plan (no full collect): order is the query's own
      scala.util.Try(qr.df.offset(cursor.toInt).limit(pageSize + 1).toJSON.collect()) match {
        case scala.util.Success(page) =>
          if (page.length > pageSize) Right((page.take(pageSize), cursor + pageSize))
          else Right((page, -1L))
        case scala.util.Failure(e) => Left(s"execution error: ${e.getMessage}")
      }
    }
  }

  def cacheStats: (Long, Long, Int, Long) = cache.stats
}

object QueryEngine {
  private val owned = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[String, Unit]]())

  private def ownedViewsFor(spark: org.apache.spark.sql.SparkSession) =
    owned.synchronized {
      Option(owned.get(spark)).getOrElse {
        val m = scala.collection.concurrent.TrieMap[String, Unit]()
        owned.put(spark, m); m
      }
    }
}
