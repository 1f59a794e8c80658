package graft.core

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped persist-once cache for expensive shared tables — the
  * batch analogue of the reference materializing an intermediate topic to
  * Kafka once and having every downstream app consume it (e.g.
  * `app/dwd/DwdTradeOrderPreProcess.java:275` writes dwd_trade_order_
  * pre_process; cancel/pay-success apps read the topic instead of
  * re-running the 5-way join).
  *
  * Cache key: identityHashCode can collide after GC reuses addresses, so
  * each entry also pins the owning session and is revalidated with `eq`
  * on hit — a colliding or stale entry (stopped session) is rebuilt,
  * never served (classic SparkSession has no sessionUUID to key by).
  * Builds are synchronized (rare and expensive — two concurrent losers
  * would each leak a persisted copy); a replaced live entry is
  * unpersisted. */
private[graft] object SessionCache {

  private val cache = TrieMap.empty[String, (SparkSession, DataFrame)]

  def apply(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = System.identityHashCode(spark) + "|" + key
    cache.get(k) match {
      case Some((owner, df)) if owner eq spark => df
      case _ => synchronized {
        // sweep entries owned by stopped sessions: their persisted blocks
        // died with the session (nothing to unpersist), but a long-lived
        // JVM cycling SparkSessions would otherwise accumulate dead
        // (session, plan) pairs here indefinitely
        cache.filterInPlace { case (_, (owner, _)) =>
          !owner.sparkContext.isStopped
        }
        cache.get(k) match {
          case Some((owner, df)) if owner eq spark => df
          case stale =>
            val df = build.persist()
            df.count() // materialize eagerly: broadcast-side subplans must
            // read the cache, not re-run the build single-task (§7.3 #4)
            stale.foreach { case (owner, old) =>
              if (owner eq spark) old.unpersist() // dead-session plans can't
            } // be touched; their blocks died with the session
            cache.put(k, (spark, df))
            df
        }
      }
    }
  }

  /** Unpersist and forget every entry owned by `spark` OR by any session
    * sharing its SparkContext (StreamHarness.prepared clones own entries
    * for the DAG/harness gates; their persisted blocks live in the shared
    * context, so a main-session-only sweep left them pinned for the rest
    * of the run). Bench calls this between scale legs: each leg re-warms
    * its own sf dir, and without eviction a three-leg run (sf0.1 +
    * sf0.01 + ×10) accumulates every leg's persisted tables in one heap —
    * at the ×10 leg the resulting GC pressure stalled the driver badly
    * enough to blow broadcast (300 s) and RPC (120 s) timeouts under the
    * 17-query DAG gate. */
  def evictOwned(spark: SparkSession): Unit = synchronized {
    val sc = spark.sparkContext
    cache.filterInPlace { case (_, (owner, df)) =>
      if (owner.sparkContext eq sc) {
        if (!owner.sparkContext.isStopped) df.unpersist()
        false
      } else true
    }
  }

  /** Unpersist and forget entries owned by EXACTLY this session. Harness/
    * DAG runs call this on their throwaway clone when the run finishes:
    * clone-keyed entries can never be reused (the key pins the clone's
    * identity), so they are dead weight the moment the clone's queries
    * stop — and the context-wide [[evictOwned]] would also drop the main
    * session's cross-gate cache, which must survive the leg. */
  def evictOwnedExactly(spark: SparkSession): Unit = synchronized {
    cache.filterInPlace { case (_, (owner, df)) =>
      if (owner eq spark) {
        if (!owner.sparkContext.isStopped) df.unpersist()
        false
      } else true
    }
  }
}
