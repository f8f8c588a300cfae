package graft

/**
 * LRU-ordered bounded memo shared by the per-JVM artifact caches
 * ([[GraphArtifacts]], [[DedupArtifacts]]) — a long-lived JVM cycling
 * through many dataset dirs must not pin checkpointed blocks forever.
 *
 * Two properties the earlier cap-and-clear helper lacked (round-11
 * advice): the build runs OUTSIDE the map mutation (check-then-put, no
 * reliance on how a map implementation tolerates mutation inside its own
 * `getOrElseUpdate` default), and eviction removes the single
 * LEAST-RECENTLY-USED entry instead of clearing the whole table — a hit
 * re-inserts the key at the back, so hot entries survive the arrival of
 * a 9th dataset dir, only the stalest re-derives. Evicted
 * frames lose their last reference here; their localCheckpoint blocks are
 * reclaimed by Spark's ContextCleaner once unreachable.
 */
/** Collision-free per-dataset path key shared by the per-JVM artifact
  * caches ([[AnnArtifacts]], [[ViewArtifacts]]) — `String.hashCode`
  * collides; md5 over the dir string does not, for any realistic set of
  * dirs. One definition so a keying change cannot silently diverge
  * between caches. */
private[graft] object DirKeys {
  def key(dir: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
    d.map(b => f"${b & 0xff}%02x").mkString
  }
}

private[graft] final class BoundedMemo[V](cap: Int) {
  require(cap >= 1, s"BoundedMemo: cap must be >= 1, got $cap")
  private val entries = scala.collection.mutable.LinkedHashMap[String, V]()

  /** Cached value for `key`, building (and caching) it on miss. The lock
    * spans the build — callers are bench/gate paths where a duplicate
    * concurrent build would be the costlier outcome. */
  def get(key: String)(build: => V): V = synchronized {
    entries.remove(key) match {
      case Some(v) =>
        // re-insert at the back: a hit refreshes recency (true LRU), so a
        // hot entry survives the arrival of a 9th dataset dir even when it
        // was the first inserted
        entries.put(key, v)
        v
      case None =>
        val v = build
        if (entries.size >= cap) entries.remove(entries.head._1)
        entries.put(key, v)
        v
    }
  }
}
