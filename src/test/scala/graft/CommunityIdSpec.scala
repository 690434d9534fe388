package graft

import org.apache.spark.sql.functions._

/** Gate for `np_community_id` (a `no_oracle` contract key — DuckDB has
  * no sha1). Two independent checks:
  *
  *   1. spec test vectors (github.com/corelight/community-id-spec, v1
  *      baseline): the published README tcp vector, plus icmp vectors
  *      derived from the spec's §ICMP pseudo-port algorithm with an
  *      independent implementation (the tcp vector anchoring that
  *      implementation to the published baseline) — fixed (tuple → id)
  *      pairs any conforming implementation must reproduce;
  *   2. a row-by-row cross-check of the Spark column against an
  *      INDEPENDENT JVM implementation (java.security.MessageDigest
  *      over hand-assembled bytes) on the synthesized flow log — a
  *      stronger digest check than a SQL oracle could give.
  */
class CommunityIdSpec extends SparkSpec {

  /** ICMPv4 request→reply type mapping (spec §ICMP, v1). */
  private val icmpReply = Map(8 -> 0, 0 -> 8, 13 -> 14, 14 -> 13,
    15 -> 16, 16 -> 15, 10 -> 9, 9 -> 10, 17 -> 18, 18 -> 17)

  /** Independent reference: the spec's algorithm, byte-level. For icmp,
    * srcPort/dstPort carry type/code (the spec's pseudo-ports). */
  private def refCommunityId(srcIp: String, dstIp: String,
      srcPort: Int, dstPort: Int, proto: String, seed: Int = 0): String = {
    def ipBytes(ip: String): Array[Byte] = ip.split("\\.").map(_.toInt.toByte)
    val protoNum: Byte = proto match {
      case "tcp" => 6; case "udp" => 17; case "icmp" => 1; case _ => -1
    }
    // icmp: a mapped type is two-way with pseudo-ports (type, reply);
    // an unmapped type is one-way with (type, code), order kept
    val (sp, dp, oneWay) =
      if (proto == "icmp") icmpReply.get(srcPort) match {
        case Some(r) => (srcPort, r, false)
        case None => (srcPort, dstPort, true)
      } else (srcPort, dstPort, false)
    def u32(b: Array[Byte]): Long =
      b.foldLeft(0L)((a, x) => a * 256L + (x & 0xff))
    val flip = !oneWay && (u32(ipBytes(srcIp)) > u32(ipBytes(dstIp)) ||
      (u32(ipBytes(srcIp)) == u32(ipBytes(dstIp)) && sp > dp))
    val (aIp, bIp, aPort, bPort) =
      if (flip) (dstIp, srcIp, dp, sp) else (srcIp, dstIp, sp, dp)
    val buf = java.nio.ByteBuffer.allocate(2 + 4 + 4 + 1 + 1 + 2 + 2)
    buf.putShort(seed.toShort)
    buf.put(ipBytes(aIp)); buf.put(ipBytes(bIp))
    buf.put(protoNum); buf.put(0.toByte)
    buf.putShort((aPort & 0xffff).toShort); buf.putShort((bPort & 0xffff).toShort)
    val digest = java.security.MessageDigest.getInstance("SHA-1").digest(buf.array())
    "1:" + java.util.Base64.getEncoder.encodeToString(digest)
  }

  test("published spec vectors reproduce (v1 baseline, seed 0)") {
    // corelight/community-id-spec README baseline example — this anchors
    // refCommunityId to the published baseline; the icmp vectors below
    // are then spec-algorithm outputs of the same anchored reference
    assert(refCommunityId("128.232.110.120", "66.35.250.204", 34855, 80, "tcp")
      == "1:LQU9qZlK+B5F3KDmev6m5PMibrg=")
    assert(refCommunityId("192.168.170.8", "192.168.170.56", 5353, 5353, "udp")
      == refCommunityId("192.168.170.56", "192.168.170.8", 5353, 5353, "udp"),
      "direction symmetry: both flow directions must hash to one id")
  }

  test("icmp spec vectors: request/reply correlate, one-way keeps order") {
    // echo request (type 8) and its reply (type 0) hash to ONE id —
    // the spec's whole point for icmp (pycommunityid pins the same id)
    assert(refCommunityId("192.168.0.89", "192.168.0.1", 8, 0, "icmp")
      == "1:X0snYXpgwiv9TZtqg64sgzUn6Dk=")
    assert(refCommunityId("192.168.0.1", "192.168.0.89", 0, 0, "icmp")
      == "1:X0snYXpgwiv9TZtqg64sgzUn6Dk=",
      "echo reply must correlate to the request's id")
    assert(refCommunityId("192.168.0.89", "192.168.0.1", 13, 0, "icmp")
      == "1:oeo0XqAz7cn/+sOcFFOn55Omz0U=")
    // one-way type (11 time-exceeded): endpoint order is KEPT, so the
    // reversed tuple hashes to a DIFFERENT id
    assert(refCommunityId("192.168.0.89", "192.168.0.1", 11, 0, "icmp")
      == "1:WWhK5yv9t1/eWrodrgw+6KseRoA=")
    assert(refCommunityId("192.168.0.1", "192.168.0.89", 11, 0, "icmp")
      == "1:5ppgsucJbrpJCp1T8kvBKS94Ib0=")
    assert(refCommunityId("10.0.0.1", "10.0.0.2", 3, 3, "icmp")
      == "1:sn6MAmXQ6UD1gYE1XbV3XTNewrk=")
  }

  test("Spark engine reproduces the icmp vectors; missing type/code yields null") {
    import spark.implicits._
    def engine(rows: Seq[(String, String, Integer, Integer)]): Seq[Option[String]] =
      rows.toDF("src_ip", "dst_ip", "icmp_type", "icmp_code")
        .select(graft.ops.Enrich.communityId(
          col("src_ip"), col("dst_ip"), lit(null), lit(null), lit("icmp"),
          icmpType = col("icmp_type"), icmpCode = col("icmp_code")).as("id"))
        .collect().toSeq.map(r => Option(r.getString(0)))
    val got = engine(Seq(
      ("192.168.0.89", "192.168.0.1", 8, 0),
      ("192.168.0.1", "192.168.0.89", 0, 0),
      ("192.168.0.89", "192.168.0.1", 11, 0),
      ("192.168.0.1", "192.168.0.89", 11, 0),
      ("10.0.0.1", "10.0.0.2", 3, 3),
      ("1.2.3.4", "5.6.7.8", null, null))) // 5-tuple record without type/code
    assert(got(0).contains("1:X0snYXpgwiv9TZtqg64sgzUn6Dk="))
    assert(got(1).contains("1:X0snYXpgwiv9TZtqg64sgzUn6Dk="),
      "echo reply must correlate to the request's id")
    assert(got(2).contains("1:WWhK5yv9t1/eWrodrgw+6KseRoA="))
    assert(got(3).contains("1:5ppgsucJbrpJCp1T8kvBKS94Ib0="),
      "one-way flows keep endpoint order — reversed tuple is a different id")
    assert(got(4).contains("1:sn6MAmXQ6UD1gYE1XbV3XTNewrk="))
    assert(got(5).isEmpty, "icmp without type/code must yield null, never a nonconforming id")
  }

  test("Spark column equals the independent JVM reference on every synthesized flow") {
    val got = SparkEntry.queries("np_community_id")(spark, sfDir)
      .select("src_ip", "dst_ip", "src_port", "dst_port", "proto",
        "icmp_type", "icmp_code", "community_id")
      .collect()
    assert(got.nonEmpty)
    var icmpRows = 0
    got.foreach { r =>
      val proto = r.getString(4)
      val want =
        if (proto == "icmp") { icmpRows += 1
          refCommunityId(r.getString(0), r.getString(1), r.getInt(5), r.getInt(6), proto)
        } else refCommunityId(r.getString(0), r.getString(1), r.getInt(2), r.getInt(3), proto)
      assert(r.getString(7) == want,
        s"community_id mismatch for ${r.mkString(",")}: want $want")
    }
    assert(icmpRows > 0, "flow fixture must carry icmp rows")
    // the synthesized flows must exercise BOTH canonical orderings
    // (flipped and unflipped), or the ordering logic is dead
    val tcpish = got.filter(_.getString(4) != "icmp")
    val flips = tcpish.count { r =>
      val su = r.getString(0).split("\\.").map(_.toLong).reduceLeft(_ * 256 + _)
      val du = r.getString(1).split("\\.").map(_.toLong).reduceLeft(_ * 256 + _)
      su > du || (su == du && r.getInt(2) > r.getInt(3))
    }
    assert(flips > 0 && flips < tcpish.length,
      s"flow fixture no longer exercises both orderings ($flips of ${tcpish.length})")
    // and both icmp branches: mapped (two-way) and unmapped (one-way) types
    val icmpTypes = got.filter(_.getString(4) == "icmp").map(_.getInt(5)).toSet
    assert(icmpTypes.exists(icmpReply.contains) && icmpTypes.exists(!icmpReply.contains(_)),
      s"icmp fixture must carry both mapped and one-way types (got $icmpTypes)")
  }
}
