package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Property fuzz for `Enrich.ipHexCol` — the address-ACCEPTANCE
  * boundary (r18 verdict task: both r17 false-correlation bugs lived
  * there, not in the hash). The reference below is deliberately built
  * from different machinery than the engine column (split-based
  * manual parsing, no regexes) and is anchored to the JDK: on every
  * input the reference ACCEPTS, `InetAddress.getByName` must agree on
  * the bytes (modulo the JDK's v4-mapped collapse, re-expanded here).
  *
  * Contract under test: ipHexCol(ip) ≡ reference hex, or BOTH null.
  * Acceptance grammar is inet_pton's (the grammar community-id
  * reference implementations use), which is STRICTER than the JDK:
  * leading-zero v4 octets reject (octal-ambiguity trap), zone indexes
  * reject, and the dotted-quad v6 tail (`::ffff:1.2.3.4`) encodes the
  * last 32 bits (RFC 4291 §2.2 form 3).
  */
class IpParseFuzzSpec extends SparkSpec {

  /** inet_pton-faithful v4 octet: digits only, 0–255, no leading zero. */
  private def parseOctet(s: String): Option[Int] =
    if (s.isEmpty || s.length > 3 || !s.forall(_.isDigit)) None
    else if (s.length > 1 && s.head == '0') None
    else { val v = s.toInt; if (v <= 255) Some(v) else None }

  private def v4Bytes(s: String): Option[Array[Byte]] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) None
    else {
      val os = parts.map(parseOctet)
      if (os.exists(_.isEmpty)) None else Some(os.map(_.get.toByte))
    }
  }

  /** Manual v6 parse: split on "::" (at most one), split halves on ":",
    * each group 1–4 lowercase hex digits; a dotted-quad may ONLY be the
    * final group and stands for the last 32 bits. No regexes. */
  private def v6Bytes(s0: String): Option[Array[Byte]] = {
    val s = s0.toLowerCase
    if (s.contains("%")) return None
    // rewrite a valid quad tail as its two hex groups
    val lastColon = s.lastIndexOf(':')
    val tail = s.substring(lastColon + 1)
    val rewritten =
      if (tail.contains(".")) v4Bytes(tail) match {
        case Some(q) =>
          val hi = ((q(0) & 0xff) << 8) | (q(1) & 0xff)
          val lo = ((q(2) & 0xff) << 8) | (q(3) & 0xff)
          s.substring(0, lastColon + 1) + hi.toHexString + ":" + lo.toHexString
        case None => return None
      } else s
    if (rewritten.contains(".")) return None // dots anywhere else reject
    def groups(x: String): Option[Seq[Int]] =
      if (x.isEmpty) Some(Nil)
      else {
        val gs = x.split(":", -1).toSeq
        if (gs.exists(g => g.isEmpty || g.length > 4 ||
            !g.forall(c => c.isDigit || (c >= 'a' && c <= 'f')))) None
        else Some(gs.map(Integer.parseInt(_, 16)))
      }
    val halves = rewritten.split("::", -1)
    val gsOpt: Option[Seq[Int]] = halves.length match {
      case 1 => groups(halves(0)).filter(_.size == 8)
      case 2 =>
        for {
          l <- groups(halves(0)); r <- groups(halves(1))
          if l.size + r.size <= 7 // "::" stands for ≥1 zero group
        } yield l ++ Seq.fill(8 - l.size - r.size)(0) ++ r
      case _ => None // more than one "::"
    }
    gsOpt.map(_.flatMap(g => Seq((g >> 8).toByte, (g & 0xff).toByte)).toArray)
  }

  private def refHex(ip: String): Option[String] = {
    val bytes = if (ip.contains(":")) v6Bytes(ip) else v4Bytes(ip)
    bytes.map(_.map(b => f"${b & 0xff}%02X").mkString)
  }

  /** JDK anchor: on inputs the manual reference accepts, the JDK must
    * parse and agree byte-for-byte. The JDK collapses `::ffff:a.b.c.d`
    * (and its hex-group spelling) to an Inet4Address — re-expand. */
  private def jdkBytes(ip: String): Option[Array[Byte]] =
    try {
      val a = java.net.InetAddress.getByName(ip).getAddress
      if (ip.contains(":") && a.length == 4)
        Some(Array.fill[Byte](10)(0) ++ Array[Byte](-1, -1) ++ a)
      else Some(a)
    } catch { case _: Exception => None }

  private val rnd = new Random(20260815L)

  private def octet(): Int = rnd.nextInt(256)
  private def hexGroup(): String = {
    val width = 1 + rnd.nextInt(4)
    (0 until width).map(_ => "0123456789abcdef"(rnd.nextInt(16))).mkString
  }

  private def validV4(): String = Seq.fill(4)(octet()).mkString(".")

  private def malformedV4(): String = rnd.nextInt(7) match {
    case 0 => // leading-zero octet (inet_pton rejects; JDK accepts)
      val o = Seq.fill(4)(octet().toString).toArray
      o(rnd.nextInt(4)) = "0" + o(rnd.nextInt(4)); o.mkString(".")
    case 1 => Seq.fill(4)(octet().toString).updated(rnd.nextInt(4),
      (256 + rnd.nextInt(744)).toString).mkString(".") // out of range
    case 2 => Seq.fill(3)(octet()).mkString(".") // three octets
    case 3 => Seq.fill(5)(octet()).mkString(".") // five octets
    case 4 => validV4() + "." // trailing dot
    case 5 => validV4().replaceFirst("\\.", "..") // empty octet
    case 6 => " " + validV4() // whitespace
  }

  private def fullV6(): String = Seq.fill(8)(hexGroup()).mkString(":")

  /** A full form with a genuine zero run, and its `::`-compressed
    * spelling — the pair must encode identically. */
  private def v6Pair(): (String, String) = {
    val runStart = rnd.nextInt(6)
    val runLen = 1 + rnd.nextInt(8 - runStart - (if (runStart == 0) 1 else 0))
    val gs = (0 until 8).map(i =>
      if (i >= runStart && i < runStart + runLen) "0" else hexGroup())
    val full = gs.mkString(":")
    val comp = gs.take(runStart).mkString(":") + "::" +
      gs.drop(runStart + runLen).mkString(":")
    (full, comp)
  }

  private def compressedV6(): String = {
    val left = rnd.nextInt(4)
    val right = rnd.nextInt(math.min(4, 8 - left)) // keep total ≤ 7
    Seq.fill(left)(hexGroup()).mkString(":") + "::" +
      Seq.fill(right)(hexGroup()).mkString(":")
  }

  private def quadTailV6(): String = rnd.nextInt(4) match {
    case 0 => "::ffff:" + validV4() // the v4-mapped form
    case 1 => "64:ff9b::" + validV4() // NAT64 well-known prefix
    case 2 => Seq.fill(6)(hexGroup()).mkString(":") + ":" + validV4() // full form 3
    case 3 => // compressed prefix + quad, total groups ≤ 7
      val left = rnd.nextInt(3)
      Seq.fill(left)(hexGroup()).mkString(":") + "::" +
        (if (rnd.nextBoolean()) hexGroup() + ":" else "") + validV4()
  }

  private def malformedV6(): String = rnd.nextInt(10) match {
    case 0 => Seq.fill(9)(hexGroup()).mkString(":") // nine groups
    case 1 => Seq.fill(7)(hexGroup()).mkString(":") // seven, no ::
    case 2 => "1:::2" // empty group adjacent to ::
    case 3 => ":" + fullV6() // lone leading colon
    case 4 => fullV6() + ":" // lone trailing colon
    case 5 => compressedV6() + "::1" // two ::
    case 6 => "::ffff:" + malformedV4() // malformed quad tail
    case 7 => validV4() + ":" + hexGroup() // quad NOT in tail position
    case 8 => fullV6() + "%eth0" // zone index (JDK accepts; inet_pton rejects)
    case 9 => // corrupt one character of a valid full form to non-hex
      val f = fullV6(); f.replace(f.charAt(rnd.nextInt(f.length)).toString, "g")
  }

  test("ipHexCol ≡ the manual inet_pton-grammar reference (or both null) on 4000 fuzzed addresses") {
    val cases = scala.collection.mutable.ArrayBuffer[String]()
    (0 until 500).foreach(_ => cases += validV4())
    (0 until 500).foreach(_ => cases += malformedV4())
    (0 until 300).foreach(_ => cases += fullV6())
    (0 until 300).foreach(_ => cases += compressedV6())
    (0 until 400).foreach(_ => cases += quadTailV6())
    (0 until 700).foreach(_ => cases += malformedV6())
    // uppercase spellings of valid forms must also parse
    (0 until 100).foreach(_ => cases += fullV6().toUpperCase)
    (0 until 100).foreach(_ => cases += quadTailV6().toUpperCase)
    // compressed/expanded identity pairs
    val pairs = (0 until 300).map(_ => v6Pair())
    pairs.foreach { case (f, c) => cases += f; cases += c }
    // directed residue the generators could miss
    cases ++= Seq("::", "::1", "1::", "0.0.0.0", "255.255.255.255",
      "01.2.3.4", "1.2.3.04", "00.0.0.0", "::1.2.3.4", ":1.2.3.4",
      "::ffff:1.2.3.4", "::ffff:300.1.1.1", "1.2.3.4:5", "", " ",
      "0:0:0:0:0:ffff:1.2.3.4", "a:b:c:d:e:f:g:1.2.3.4")

    import spark.implicits._
    val got = cases.toSeq.toDF("ip")
      .select(col("ip"), graft.ops.Enrich.ipHexCol(col("ip")).as("hex"))
      .collect().map(r => (r.getString(0), Option(r.getString(1))))

    var accepted4, accepted6, rejected = 0
    got.foreach { case (ip, engineHex) =>
      val ref = refHex(ip)
      assert(engineHex == ref,
        s"ipHexCol('$ip') = $engineHex but reference = $ref")
      // JDK anchor: accepted inputs must agree with InetAddress bytes
      ref.foreach { h =>
        val jdk = jdkBytes(ip).map(_.map(b => f"${b & 0xff}%02X").mkString)
        assert(jdk.contains(h), s"JDK disagrees on accepted '$ip': $jdk vs $h")
        if (h.length == 8) accepted4 += 1 else accepted6 += 1
      }
      if (ref.isEmpty) rejected += 1
    }
    // the generators must actually exercise all three outcomes at volume
    assert(accepted4 >= 500, s"want ≥500 accepted v4, got $accepted4")
    assert(accepted6 >= 1200, s"want ≥1200 accepted v6, got $accepted6")
    assert(rejected >= 900, s"want ≥900 rejected, got $rejected")

    // the compressed/expanded pairs must encode identically
    val hexOf = got.toMap
    pairs.foreach { case (f, c) =>
      assert(hexOf(f).isDefined && hexOf(f) == hexOf(c),
        s"compressed '$c' must encode like expanded '$f': ${hexOf(c)} vs ${hexOf(f)}")
    }
  }
}
