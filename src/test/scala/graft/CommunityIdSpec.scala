package graft

import org.apache.spark.sql.functions._

/** Gate for `np_community_id` (a `no_oracle` contract key — DuckDB has
  * no sha1). Two independent checks:
  *
  *   1. the published test vectors from the Corelight community-id
  *      spec (github.com/corelight/community-id-spec, v1 baseline) —
  *      fixed (5-tuple → id) pairs any conforming implementation must
  *      reproduce;
  *   2. a row-by-row cross-check of the Spark column against an
  *      INDEPENDENT JVM implementation (java.security.MessageDigest
  *      over hand-assembled bytes) on the synthesized flow log — a
  *      stronger digest check than a SQL oracle could give.
  */
class CommunityIdSpec extends SparkSpec {

  /** Independent reference: the spec's algorithm, byte-level. */
  private def refCommunityId(srcIp: String, dstIp: String,
      srcPort: Int, dstPort: Int, proto: String, seed: Int = 0): String = {
    def ipBytes(ip: String): Array[Byte] = ip.split("\\.").map(_.toInt.toByte)
    val protoNum: Byte = proto match {
      case "tcp" => 6; case "udp" => 17; case "icmp" => 1; case _ => -1
    }
    def u32(b: Array[Byte]): Long =
      b.foldLeft(0L)((a, x) => a * 256L + (x & 0xff))
    val flip = u32(ipBytes(srcIp)) > u32(ipBytes(dstIp)) ||
      (u32(ipBytes(srcIp)) == u32(ipBytes(dstIp)) && srcPort > dstPort)
    val (aIp, bIp, aPort, bPort) =
      if (flip) (dstIp, srcIp, dstPort, srcPort) else (srcIp, dstIp, srcPort, dstPort)
    val buf = java.nio.ByteBuffer.allocate(2 + 4 + 4 + 1 + 1 + 2 + 2)
    buf.putShort(seed.toShort)
    buf.put(ipBytes(aIp)); buf.put(ipBytes(bIp))
    buf.put(protoNum); buf.put(0.toByte)
    buf.putShort((aPort & 0xffff).toShort); buf.putShort((bPort & 0xffff).toShort)
    val digest = java.security.MessageDigest.getInstance("SHA-1").digest(buf.array())
    "1:" + java.util.Base64.getEncoder.encodeToString(digest)
  }

  test("published spec vectors reproduce (v1 baseline, seed 0)") {
    // corelight/community-id-spec README baseline examples
    assert(refCommunityId("128.232.110.120", "66.35.250.204", 34855, 80, "tcp")
      == "1:LQU9qZlK+B5F3KDmev6m5PMibrg=")
    assert(refCommunityId("192.168.170.8", "192.168.170.56", 5353, 5353, "udp")
      == refCommunityId("192.168.170.56", "192.168.170.8", 5353, 5353, "udp"),
      "direction symmetry: both flow directions must hash to one id")
  }

  test("icmp (pseudo-port protocols) yield null, never a nonconforming id") {
    // the spec hashes ICMP with type/code pseudo-ports + a one-way
    // reply mapping — fields a 5-tuple flow record doesn't carry; the
    // engine must return null rather than an id no conforming
    // implementation would produce
    import spark.implicits._
    val row = Seq(("1.2.3.4", "5.6.7.8", 8, 0, "icmp"), ("1.2.3.4", "5.6.7.8", 1, 2, "tcp"))
      .toDF("src_ip", "dst_ip", "src_port", "dst_port", "proto")
      .select(graft.ops.Enrich.communityId(
        org.apache.spark.sql.functions.col("src_ip"),
        org.apache.spark.sql.functions.col("dst_ip"),
        org.apache.spark.sql.functions.col("src_port"),
        org.apache.spark.sql.functions.col("dst_port"),
        org.apache.spark.sql.functions.col("proto")).as("id"))
      .collect()
    assert(row(0).isNullAt(0), "icmp must yield null")
    assert(row(1).getString(0) == refCommunityId("1.2.3.4", "5.6.7.8", 1, 2, "tcp"))
  }

  test("Spark column equals the independent JVM reference on every synthesized flow") {
    val got = SparkEntry.queries("np_community_id")(spark, sfDir)
      .select("src_ip", "dst_ip", "src_port", "dst_port", "proto", "community_id")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val want = refCommunityId(r.getString(0), r.getString(1),
        r.getInt(2), r.getInt(3), r.getString(4))
      assert(r.getString(5) == want,
        s"community_id mismatch for ${r.mkString(",")}: want $want")
    }
    // the synthesized flows must actually exercise BOTH canonical
    // orderings (flipped and unflipped), or the ordering logic is dead
    val flips = got.count { r =>
      val su = r.getString(0).split("\\.").map(_.toLong).reduceLeft(_ * 256 + _)
      val du = r.getString(1).split("\\.").map(_.toLong).reduceLeft(_ * 256 + _)
      su > du || (su == du && r.getInt(2) > r.getInt(3))
    }
    assert(flips > 0 && flips < got.length,
      s"flow fixture no longer exercises both orderings ($flips of ${got.length})")
  }
}
