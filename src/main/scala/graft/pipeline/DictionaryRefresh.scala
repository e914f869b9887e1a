package graft.pipeline

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The reference's in-RAM dictionaries with LIFETIME refresh
  * (create_tables.sql:48-67,97-114: hashed layout, 43 200 s TTL) as a
  * TTL-cached broadcast dimension.
  *
  * `get` returns a broadcast-hinted, cached DataFrame; after `ttlMillis`
  * the next call re-reads the dimension, re-caches and re-broadcasts —
  * exactly the dictionary reload. Consumers just join against `get()`
  * wherever the reference would call dictGet.
  */
final class DictionaryRefresh(load: () => DataFrame, ttlMillis: Long,
                              clock: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(df: DataFrame, loadedAt: Long)
  private val cached = new AtomicReference[Option[Entry]](None)

  def get(): DataFrame = {
    val now = clock()
    cached.get() match {
      case Some(e) if now - e.loadedAt < ttlMillis => e.df
      case stale =>
        stale.foreach(e => e.df.unpersist(blocking = false))
        val fresh = load().cache()
        val entry = Entry(broadcast(fresh), now)
        cached.set(Some(entry))
        entry.df
    }
  }

  def invalidate(): Unit = {
    cached.get().foreach(e => e.df.unpersist(blocking = false))
    cached.set(None)
  }
}
