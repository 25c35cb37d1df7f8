package graft

/** Driver-side memoizer for build-once artifacts (trained ANN quantizers,
  * codebooks) keyed by a logical key plus a DATA snapshot id
  * ([[Tables.snapshotId]]): serves the cached value while the snapshot
  * matches, retrains IN PLACE when it moves. The structural bound (ADVICE
  * r15: a snapshot-suffixed map key grew one entry per rewrite, never
  * evicting superseded models): at most ONE value is ever held per
  * logical key, so a long-lived session that rewrites a dataset
  * repeatedly holds exactly one artifact per (tag, dir) —
  * [[SnapshotMemoizerSpec]] pins build-once, rebuild-on-move, and the
  * size bound.
  *
  * `compute` runs the builder under the key's bin lock — the same
  * once-per-key guarantee `computeIfAbsent` gives (concurrent callers of
  * the same key never train twice).
  */
final class SnapshotMemoizer[V <: AnyRef] {
  private val map =
    new java.util.concurrent.ConcurrentHashMap[String, (String, V)]()

  def get(key: String, snapshot: String)(build: => V): V =
    map.compute(key, (_, prev) =>
      if (prev != null && prev._1 == snapshot) prev else (snapshot, build))._2

  /** Number of logical keys held (each with exactly one value). */
  def size: Int = map.size
}
