package graft.streaming

/** Shared pure-Scala md5-hex for the streaming signature functions
  * (`StreamingNearDup.simhash64`, `StreamingMinHash.signature`):
  * thread-local digest + manual hex table, the same pattern as the
  * batch side's `graft.expressions.Md5Hash` — these run once per
  * (token|shingle) per document inside streaming UDFs/flatMaps, so a
  * per-call `MessageDigest.getInstance` and per-byte format string
  * would be the hot-loop cost the batch side already eliminated. */
private[streaming] object Md5Hex {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Hex = "0123456789abcdef".toCharArray

  def apply(s: String): String = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
