package graft.functions

/** Driver-side hash-seed derivation shared by every operator that
  * embeds md5-derived constants in its plan (LSH plane weights,
  * minhash affine coefficients): the top 60 bits (15 hex chars) of
  * md5(key) as a non-negative long — the single arithmetic rule the
  * DuckDB oracles spell as
  * `CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT)`.
  */
object HashSeeds {
  def md5TopLong(key: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }
}
