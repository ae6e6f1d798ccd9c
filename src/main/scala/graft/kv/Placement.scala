package graft.kv

/** Byte-exact reproduction of the reference's placement functions
  * (/root/reference/distribution/util/id.js:72-148): content ids are
  * sha256 over the JSON form of the value, node ids hash the `{ip, port}`
  * pair, and the three placement policies (naive modulo, consistent
  * ring, rendezvous argmax) pick a node id for a key id. Verified against
  * the reference suite's documented placements
  * (/root/reference/test/all.test.js:852-1028) in PlacementSpec.
  *
  * Numeric subtlety: the reference runs `parseInt(hex, 16)` on 256-bit
  * ids, collapsing them to IEEE doubles. Parity therefore requires the
  * same collapse — [[idToNum]] converts through BigInt with
  * round-to-nearest, which is what the JS runtime produces for the full
  * string. All comparisons/modulo below happen in double space exactly
  * like the original.
  *
  * These functions complement (not replace) the engine's own Store
  * layout: `Store` shards by `pmod(xxhash64(key), n)` bucket dirs — the
  * Spark-idiomatic placement — while `Placement` exists for byte parity
  * with reference deployments (e.g. interpreting where a reference
  * cluster would have put a key, or migrating such a layout).
  */
object Placement {

  /** JSON.stringify for the string/number shapes the id scheme hashes
    * (JSON standard escaping; matches the JS output byte for byte for
    * the BMP text keys the reference uses).
    */
  private[kv] def jsonString(s: String): String = {
    val b = new StringBuilder(s.length + 2)
    b.append('"')
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\b' => b.append("\\b")
      case '\f' => b.append("\\f")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"')
    b.toString
  }

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** getID of a string key: sha256(JSON.stringify(key)) (id.js:72-78). */
  def getID(key: String): String = sha256Hex(jsonString(key))

  /** getNID: sha256 of the canonical `{"ip":…,"port":…}` JSON
    * (id.js:79-89; the reference rebuilds the object with exactly these
    * two fields in this order before stringifying).
    */
  def getNID(ip: String, port: Int): String =
    sha256Hex(s"""{"ip":${jsonString(ip)},"port":$port}""")

  /** getSID: first 5 hex chars of the NID (id.js:90-93). */
  def getSID(ip: String, port: Int): String = getNID(ip, port).take(5)

  /** parseInt(hex, 16) → the same IEEE double the JS runtime yields. */
  def idToNum(id: String): Double = BigInt(id, 16).toDouble

  /** naiveHash: lexicographically sort the nids, index by
    * `idToNum(kid) % n` computed in double space (id.js:107-113).
    */
  def naiveHash(kid: String, nids: Seq[String]): String = {
    require(nids.nonEmpty, "naiveHash: empty node list")
    val sorted = nids.sorted
    sorted((idToNum(kid) % sorted.length).toInt)
  }

  /** consistentHash: hash ring ordered by numeric id; first node at or
    * after the key, wrapping to the smallest (id.js:114-129).
    */
  def consistentHash(kid: String, nids: Seq[String]): String = {
    require(nids.nonEmpty, "consistentHash: empty node list")
    val kn = idToNum(kid)
    val ring = nids.map(n => (idToNum(n), n)).sortBy(_._1)
    ring.find(kn <= _._1).getOrElse(ring.head)._2
  }

  /** rendezvousHash: argmax over nodes of idToNum(getID(kid + nid)),
    * strict greater-than from zero (id.js:130-148).
    */
  def rendezvousHash(kid: String, nids: Seq[String]): String = {
    require(nids.nonEmpty, "rendezvousHash: empty node list")
    var best = 0.0
    var bestN: String = null
    nids.foreach { n =>
      val h = idToNum(getID(kid + n))
      if (h > best) { best = h; bestN = n }
    }
    bestN
  }
}
