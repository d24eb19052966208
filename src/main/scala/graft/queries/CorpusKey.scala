package graft.queries

/** Collision-proof per-corpus key for gate-side index/warehouse dirs.
  *
  * The gates keep derived state (dedup indexes, text/json/IVF indexes,
  * hybrid-index roots) in per-corpus directories. Keying those by the
  * corpus dir's BASENAME alone would let two different corpus paths with
  * the same last segment (`/a/sf0.01` and `/b/sf0.01`) share state in
  * one session and silently cross-contaminate results, so the key is
  * the sanitized basename (human-readable) + an 8-hex md5 prefix of the
  * CANONICAL absolute path (collision-proof). Deterministic across
  * sessions for the same path — warm state survives restarts. */
object CorpusKey {
  def of(dir: String): String = {
    val f = new java.io.File(dir)
    val canonical =
      try f.getCanonicalPath catch { case _: java.io.IOException =>
        f.getAbsolutePath }
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8"))
    val hex = md.take(4).map("%02x".format(_)).mkString
    f.getName.replaceAll("[^A-Za-z0-9_]", "_") + "_" + hex
  }
}
