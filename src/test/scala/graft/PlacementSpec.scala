package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.kv.Placement._

/** Byte-exact parity with the reference's id/placement scheme, pinned to
  * the placements its OWN suite documents
  * (/root/reference/test/all.test.js:852-1028: nodes n1–n6 are
  * 127.0.0.1:8000–8005; with naiveHash over [n4, n5, n6] key
  * 'ewatsonmrnh' lands on n6 and the other four on n4; after n5 leaves,
  * all five land on n6).
  */
class PlacementSpec extends AnyFunSuite {

  private val nodes: Map[String, (String, Int)] =
    (1 to 6).map(i => s"n$i" -> ("127.0.0.1", 8000 + i - 1)).toMap
  private val nid: Map[String, String] =
    nodes.map { case (k, (ip, p)) => k -> getNID(ip, p) }
  private val byNid: Map[String, String] = nid.map(_.swap)

  private val keys = Seq("ewatsonmrnh", "jkrasinskimrnh", "jbowenmrnh",
    "sspielbergmrnh", "tnelsonmrnh")

  test("naiveHash reproduces the reference suite's documented placements") {
    val trio = Seq(nid("n4"), nid("n5"), nid("n6"))
    val picked = keys.map(k => byNid(naiveHash(getID(k), trio)))
    assert(picked === Seq("n6", "n4", "n4", "n4", "n4"))
    // after n5 is removed, the reference documents all five keys on n6
    val duo = Seq(nid("n4"), nid("n6"))
    assert(keys.map(k => byNid(naiveHash(getID(k), duo))).forall(_ == "n6"))
  }

  test("getID/getNID/getSID match the reference's sha256-of-JSON scheme") {
    // sha256 of the literal bytes '"jcarbspcs"' (JSON.stringify of the key)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expected = md.digest("\"jcarbspcs\"".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(getID("jcarbspcs") === expected)
    assert(nid("n1").length === 64)
    assert(getSID("127.0.0.1", 8000) === nid("n1").take(5))
  }

  test("consistentHash: ring order, inclusive bound, wrap-around") {
    val ring = Seq(nid("n1"), nid("n2"), nid("n3"))
    // every node id maps to ITSELF (kid == node hash → kn <= hash picks it)
    ring.foreach(n => assert(consistentHash(n, ring) === n))
    // a key numerically above the whole ring wraps to the smallest hash
    val top = "f" * 64
    val smallest = ring.minBy(idToNum)
    assert(consistentHash(top, ring) === smallest)
  }

  test("rendezvousHash: deterministic argmax, sensitive to membership") {
    val all = Seq(nid("n2"), nid("n4"), nid("n6"))
    val kid = getID("jcarbspcs")
    val pick = rendezvousHash(kid, all)
    assert(pick === rendezvousHash(kid, all)) // deterministic
    // removing the winner changes the placement to the runner-up,
    // leaving other keys' placements mostly intact (the rendezvous
    // minimal-disruption property)
    val without = all.filterNot(_ == pick)
    assert(rendezvousHash(kid, without) !== pick)
  }

  test("consistent/rendezvous spread a key population over the nodes") {
    val nids = nid.values.toSeq
    val kids = (1 to 200).map(i => getID(s"key$i"))
    Seq[(String, (String, Seq[String]) => String)](
      ("consistent", consistentHash),
      ("rendezvous", rendezvousHash)).foreach { case (name, fn) =>
      val used = kids.map(fn(_, nids)).distinct.size
      assert(used >= 4, s"$name uses only $used of 6 nodes")
    }
  }

  test("naiveHash reproduces the reference's even-index bias at n=6") {
    // parseInt collapses the 256-bit id to a double whose value is a
    // mantissa times 2^~203 — always divisible by 2 — so `% 6` can only
    // yield EVEN indices and half the nodes are unreachable. This is the
    // reference's real behavior (id.js:107-113 has the same collapse),
    // reproduced here deliberately; the engine's own Store layout uses
    // pmod(xxhash64) and has no such bias.
    val nids = nid.values.toSeq
    val sorted = nids.sorted
    val kids = (1 to 200).map(i => getID(s"key$i"))
    val indices = kids.map(k => sorted.indexOf(naiveHash(k, nids))).toSet
    assert(indices.subsetOf(Set(0, 2, 4)))
    assert(indices.size === 3) // all three reachable nodes are hit
  }
}
