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

  /** ICMPv6 request→reply type mapping (spec §ICMP, v1): echo 128/129,
    * MLD 130/131, router sol/adv 133/134, neighbor sol/adv 135/136,
    * node-info 139/140, home-agent 144/145. */
  private val icmp6Reply = Map(128 -> 129, 129 -> 128, 130 -> 131,
    131 -> 130, 133 -> 134, 134 -> 133, 135 -> 136, 136 -> 135,
    139 -> 140, 140 -> 139, 144 -> 145, 145 -> 144)

  /** Independent reference: the spec's algorithm, byte-level, BOTH
    * address families (v6 parsed by the JDK — independent of the
    * engine's own hex-group string machinery). For icmp/ipv6-icmp,
    * srcPort/dstPort carry type/code (the spec's pseudo-ports). */
  private def refCommunityId(srcIp: String, dstIp: String,
      srcPort: Int, dstPort: Int, proto: String, seed: Int = 0): String = {
    def ipBytes(ip: String): Array[Byte] =
      if (ip.contains(":")) {
        val a = java.net.InetAddress.getByName(ip).getAddress
        // the JDK collapses the v4-mapped form (::ffff:a.b.c.d and its
        // hex-group spelling) to an Inet4Address; the byte-tuple spec
        // (inet_pton) keeps the 16-byte form — re-expand
        if (a.length == 4) Array.fill[Byte](10)(0) ++ Array[Byte](-1, -1) ++ a
        else a
      } else ip.split("\\.").map(_.toInt.toByte)
    val protoNum: Byte = proto match {
      case "tcp" => 6; case "udp" => 17; case "sctp" => 132.toByte
      case "icmp" => 1; case "ipv6-icmp" => 58; case _ => -1
    }
    // icmp: a mapped type is two-way with pseudo-ports (type, reply);
    // an unmapped type is one-way with (type, code), order kept
    val (sp, dp, oneWay) =
      if (proto == "icmp") icmpReply.get(srcPort) match {
        case Some(r) => (srcPort, r, false)
        case None => (srcPort, dstPort, true)
      } else if (proto == "ipv6-icmp") icmp6Reply.get(srcPort) match {
        case Some(r) => (srcPort, r, false)
        case None => (srcPort, dstPort, true)
      } else (srcPort, dstPort, false)
    // canonical order: unsigned byte-tuple comparison (the spec), any width
    def cmpBytes(a: Array[Byte], b: Array[Byte]): Int =
      a.zip(b).collectFirst {
        case (x, y) if x != y => java.lang.Integer.compare(x & 0xff, y & 0xff)
      }.getOrElse(0)
    val (sb, db) = (ipBytes(srcIp), ipBytes(dstIp))
    val c = cmpBytes(sb, db)
    val flip = !oneWay && (c > 0 || (c == 0 && sp > dp))
    val (aIp, bIp, aPort, bPort) =
      if (flip) (db, sb, dp, sp) else (sb, db, sp, dp)
    val buf = java.nio.ByteBuffer.allocate(2 + aIp.length + bIp.length + 1 + 1 + 2 + 2)
    buf.putShort(seed.toShort)
    buf.put(aIp); buf.put(bIp)
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

  test("icmpv6 + ipv6 spec vectors: v6 type map, byte-tuple order, family guards") {
    // vectors generated by an independent Python implementation
    // (inet_pton + hashlib) anchored to the published tcp baseline; the
    // neighbor-solicit id matches pycommunityid's published v6 vector
    assert(refCommunityId("fe80::200:86ff:fe05:80da",
      "fe80::260:97ff:fe07:69ea", 135, 0, "ipv6-icmp")
      == "1:dGHyGvjMfljg6Bppwm3bg0LO8TY=")
    assert(refCommunityId("fe80::260:97ff:fe07:69ea",
      "fe80::200:86ff:fe05:80da", 136, 0, "ipv6-icmp")
      == "1:dGHyGvjMfljg6Bppwm3bg0LO8TY=",
      "neighbor advert must correlate to the solicit's id")
    assert(refCommunityId("2001:db8::1", "2001:db8::2", 128, 0, "ipv6-icmp")
      == "1:u2vMS3HiWth2lIMKHB1fjELshpQ=")
    assert(refCommunityId("2001:db8::2", "2001:db8::1", 129, 0, "ipv6-icmp")
      == "1:u2vMS3HiWth2lIMKHB1fjELshpQ=", "v6 echo reply correlates")
    // one-way v6 type (1 destination-unreachable): order kept
    assert(refCommunityId("2001:db8::1", "2001:db8::2", 1, 4, "ipv6-icmp")
      == "1:bxlcj5MwLJ0Mq/msovtKJa8pGZ4=")
    assert(refCommunityId("2001:db8::2", "2001:db8::1", 1, 4, "ipv6-icmp")
      == "1:qxd1LeYGiZWewhdgFCEH4g39f1w=")
    // tcp over v6: direction symmetry through byte-tuple ordering
    assert(refCommunityId("2001:470:e5bf:dead:4957:2174:e82c:4887",
      "2607:f8b0:400c:c03::1a", 10046, 25, "tcp")
      == "1:Colfs5LYIHEswKj/9blhN4Az1M8=")
    assert(refCommunityId("2607:f8b0:400c:c03::1a",
      "2001:470:e5bf:dead:4957:2174:e82c:4887", 25, 10046, "tcp")
      == "1:Colfs5LYIHEswKj/9blhN4Az1M8=")

    // and the ENGINE reproduces every one of them, including the
    // zero-compression == expanded-form identity and the null guards
    import spark.implicits._
    def engine(rows: Seq[(String, String, Integer, Integer, String, Integer, Integer)]):
        Seq[Option[String]] =
      rows.toDF("src_ip", "dst_ip", "src_port", "dst_port", "proto",
        "icmp_type", "icmp_code")
        .select(graft.ops.Enrich.communityId(
          col("src_ip"), col("dst_ip"), col("src_port"), col("dst_port"),
          col("proto"), icmpType = col("icmp_type"),
          icmpCode = col("icmp_code")).as("id"))
        .collect().toSeq.map(r => Option(r.getString(0)))
    val got = engine(Seq(
      ("fe80::200:86ff:fe05:80da", "fe80::260:97ff:fe07:69ea", null, null, "ipv6-icmp", 135, 0),
      ("fe80::260:97ff:fe07:69ea", "fe80::200:86ff:fe05:80da", null, null, "ipv6-icmp", 136, 0),
      ("2001:db8::1", "2001:db8::2", null, null, "ipv6-icmp", 128, 0),
      ("2001:db8::1", "2001:db8::2", null, null, "ipv6-icmp", 1, 4),
      ("2001:db8::2", "2001:db8::1", null, null, "ipv6-icmp", 1, 4),
      ("2001:470:e5bf:dead:4957:2174:e82c:4887", "2607:f8b0:400c:c03::1a", 10046, 25, "tcp", null, null),
      // zero-compression and fully-expanded forms hash identically
      ("fe80::1", "fe80:0:0:0:0:0:0:2", 5353, 5353, "udp", null, null),
      ("fe80:0:0:0:0:0:0:1", "fe80::2", 5353, 5353, "udp", null, null),
      // guards: mixed family, proto/family mismatch (both directions),
      // v6 icmp without type, malformed v6
      ("2001:db8::1", "5.6.7.8", 1, 2, "tcp", null, null),
      ("2001:db8::1", "2001:db8::2", null, null, "icmp", 8, 0),
      ("1.2.3.4", "5.6.7.8", null, null, "ipv6-icmp", 128, 0),
      ("2001:db8::1", "2001:db8::2", null, null, "ipv6-icmp", null, null),
      ("2001:db8::zz", "2001:db8::2", 1, 2, "tcp", null, null),
      ("1::2::3", "2001:db8::2", 1, 2, "tcp", null, null),
      // r17 review: non-boundary empty groups and lone leading/trailing
      // colons must null, never silently hash like a DIFFERENT valid
      // address ("1:::2" ≠ "1::2"; the JDK reference rejects all three)
      ("1:::2", "2001:db8::2", 1, 2, "tcp", null, null),
      ("1:2:3:4:5:6:7:8:", "2001:db8::2", 1, 2, "tcp", null, null),
      (":1:2:3:4:5:6:7:8", "2001:db8::2", 1, 2, "tcp", null, null),
      // r17 second review: malformed v4 must null too — an out-of-range
      // octet's 9-char hex would otherwise lpad-TRUNCATE to the exact
      // encoding of a different valid address (300.1.1.1 ≡ 18.192.16.16)
      // and a fifth octet would silently drop (1.2.3.4.5 ≡ 1.2.3.4)
      ("300.1.1.1", "5.6.7.8", 1, 2, "tcp", null, null),
      ("1.2.3.4.5", "5.6.7.8", 1, 2, "tcp", null, null),
      ("1.2.3", "5.6.7.8", 1, 2, "tcp", null, null)))
    assert(got(0).contains("1:dGHyGvjMfljg6Bppwm3bg0LO8TY="))
    assert(got(1).contains("1:dGHyGvjMfljg6Bppwm3bg0LO8TY="))
    assert(got(2).contains("1:u2vMS3HiWth2lIMKHB1fjELshpQ="))
    assert(got(3).contains("1:bxlcj5MwLJ0Mq/msovtKJa8pGZ4="))
    assert(got(4).contains("1:qxd1LeYGiZWewhdgFCEH4g39f1w="))
    assert(got(5).contains("1:Colfs5LYIHEswKj/9blhN4Az1M8="))
    assert(got(6) == got(7) && got(6).contains(
      refCommunityId("fe80::1", "fe80::2", 5353, 5353, "udp")),
      "zero-compression and expanded v6 forms must hash identically")
    (8 to 19).foreach { i =>
      assert(got(i).isEmpty, s"row $i must null (family/shape guard), got ${got(i)}")
    }
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
        if (proto == "icmp" || proto == "ipv6-icmp") { icmpRows += 1
          refCommunityId(r.getString(0), r.getString(1), r.getInt(5), r.getInt(6), proto)
        } else refCommunityId(r.getString(0), r.getString(1), r.getInt(2), r.getInt(3), proto)
      assert(r.getString(7) == want,
        s"community_id mismatch for ${r.mkString(",")}: want $want")
    }
    assert(icmpRows > 0, "flow fixture must carry icmp rows")
    // the synthesized flows must exercise BOTH canonical orderings
    // (flipped and unflipped), or the ordering logic is dead
    val tcpish = got.filter(r =>
      r.getString(4) != "icmp" && r.getString(4) != "ipv6-icmp"
        && !r.getString(0).contains(":"))
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
    // the v6 slice must be present and exercise BOTH v6 icmp branches
    // plus v6 tcp/udp (the byte-tuple ordering over 16-byte addresses)
    val v6Rows = got.filter(_.getString(0).contains(":"))
    assert(v6Rows.nonEmpty, "fixture must carry the re-addressed v6 slice")
    val icmp6Types = v6Rows.filter(_.getString(4) == "ipv6-icmp").map(_.getInt(5)).toSet
    assert(icmp6Types.exists(icmp6Reply.contains) && icmp6Types.exists(!icmp6Reply.contains(_)),
      s"v6 slice must carry both mapped and one-way icmpv6 types (got $icmp6Types)")
    assert(v6Rows.exists(r => r.getString(4) == "tcp" || r.getString(4) == "udp"),
      "v6 slice must carry port-carrying protocols too")
    assert(v6Rows.forall(_.getString(7) != null),
      "every v6 row must produce an id (the family guards must not misfire)")
  }

  test("r18 advice pins: quad-tail v6 forms, inet_pton v4 strictness, uint16 port/type gate") {
    import spark.implicits._
    def engine(rows: Seq[(String, String, Integer, Integer, String, Integer, Integer)]):
        Seq[Option[String]] =
      rows.toDF("src_ip", "dst_ip", "src_port", "dst_port", "proto",
        "icmp_type", "icmp_code")
        .select(graft.ops.Enrich.communityId(
          col("src_ip"), col("dst_ip"), col("src_port"), col("dst_port"),
          col("proto"), icmpType = col("icmp_type"),
          icmpCode = col("icmp_code")).as("id"))
        .collect().toSeq.map(r => Option(r.getString(0)))
    val got = engine(Seq(
      // RFC-4291 §2.2 form 3: the dotted-quad tail encodes the last 32
      // bits — the mapped form, its hex-group spelling, and NAT64 all
      // hash; the quad spelling must equal the hex-group spelling
      ("::ffff:1.2.3.4", "::ffff:5.6.7.8", 1234, 80, "tcp", null, null),
      ("::ffff:102:304", "::ffff:506:708", 1234, 80, "tcp", null, null),
      ("64:ff9b::1.2.3.4", "64:ff9b::5.6.7.8", 1234, 80, "tcp", null, null),
      ("64:ff9b::102:304", "64:ff9b::506:708", 1234, 80, "tcp", null, null),
      ("a:b:c:d:e:f:1.2.3.4", "a:b:c:d:e:f:5.6.7.8", 53, 53, "udp", null, null),
      // inet_pton strictness: leading-zero octets null (the JDK accepts
      // them as decimal, inet_pton — the reference parser — rejects)
      ("01.2.3.4", "5.6.7.8", 1, 2, "tcp", null, null),
      ("1.2.3.04", "5.6.7.8", 1, 2, "tcp", null, null),
      // a malformed quad TAIL nulls the whole v6 address (never
      // truncate-hashes like the r17 "300.1.1.1" v4 class)
      ("::ffff:300.1.1.1", "::ffff:5.6.7.8", 1, 2, "tcp", null, null),
      ("::ffff:01.2.3.4", "::ffff:5.6.7.8", 1, 2, "tcp", null, null),
      // uint16 gate: an out-of-range or negative port/type would widen
      // hex() past 4 chars and MALFORM the payload — must null instead
      ("1.2.3.4", "5.6.7.8", 70000, 80, "tcp", null, null),
      ("1.2.3.4", "5.6.7.8", -1, 80, "tcp", null, null),
      ("1.2.3.4", "5.6.7.8", 80, 65536, "tcp", null, null),
      ("1.2.3.4", "5.6.7.8", null, null, "icmp", 70000, 0),
      ("1.2.3.4", "5.6.7.8", null, null, "icmp", 3, 70000), // one-way code
      // boundary values ARE valid uint16
      ("1.2.3.4", "5.6.7.8", 0, 65535, "tcp", null, null)))
    // quad spelling ≡ hex-group spelling, and both match the JVM reference
    assert(got(0).isDefined && got(0) == got(1),
      s"v4-mapped quad tail must hash like its hex-group spelling: ${got(0)} vs ${got(1)}")
    assert(got(0).contains(refCommunityId("::ffff:1.2.3.4", "::ffff:5.6.7.8", 1234, 80, "tcp")))
    assert(got(2).isDefined && got(2) == got(3),
      s"NAT64 quad tail must hash like its hex-group spelling: ${got(2)} vs ${got(3)}")
    assert(got(2).contains(refCommunityId("64:ff9b::1.2.3.4", "64:ff9b::5.6.7.8", 1234, 80, "tcp")))
    assert(got(4).contains(refCommunityId("a:b:c:d:e:f:1.2.3.4", "a:b:c:d:e:f:5.6.7.8", 53, 53, "udp")))
    (5 to 13).foreach { i =>
      assert(got(i).isEmpty, s"row $i must null (strict parse / uint16 gate), got ${got(i)}")
    }
    assert(got(14).contains(refCommunityId("1.2.3.4", "5.6.7.8", 0, 65535, "tcp")),
      "0 and 65535 are valid uint16 boundary ports")
  }
}
