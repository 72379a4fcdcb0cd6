package graft

import graft.functions.IpFunctions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's hermetic parser tests 1:1
  * (`/root/reference/filename_parser_test.go:9-35`) plus seeded property tests.
  */
class IpFunctionsSpec extends AnyFunSuite {

  test("GetLocalIP: plain IPv4 name (filename_parser_test.go:10-14)") {
    assert(extractLocalIp("20170225T23:00:00Z_4.34.58.34_0.web100.gz") == "4.34.58.34")
  }

  test("GetLocalIP: old format without IP (filename_parser_test.go:16-20)") {
    assert(extractLocalIp("20170225T23:00:00Z_ALL0.web100.gz") == "")
  }

  test("GetLocalIP: malformed ::: IPv6 normalized (filename_parser_test.go:22-26)") {
    assert(extractLocalIp("20170225T23:00:00Z_2001:4c08:2003:3f:::230_ALL0.web100.gz")
      == "2001:4c08:2003:3f::230")
  }

  test("GetDate semantics handled by NameFunctions.fileDate (string head)") {
    assert("20170225T23:00:00Z_4.34.58.34_0.web100.gz".take(8) == "20170225")
  }

  test("no underscore / single underscore → empty") {
    assert(extractLocalIp("nounderscore") == "")
    assert(extractLocalIp("one_underscore") == "")
    assert(extractLocalIp(null) == "")
  }

  test("non-IP between underscores → empty") {
    assert(extractLocalIp("a_notanip_b") == "")
    assert(extractLocalIp("a_999.1.1.1_b") == "")
    assert(extractLocalIp("a_1.2.3_b") == "")
  }

  test("IPv4 validation") {
    assert(isValidIpv4("0.0.0.0"))
    assert(isValidIpv4("255.255.255.255"))
    assert(!isValidIpv4("256.1.1.1"))
    assert(!isValidIpv4("1.2.3"))
    assert(!isValidIpv4("1.2.3.4.5"))
    assert(!isValidIpv4("1..3.4"))
    assert(!isValidIpv4("a.b.c.d"))
  }

  test("IPv6 validation") {
    assert(isValidIpv6("::"))
    assert(isValidIpv6("::1"))
    assert(isValidIpv6("2001:4c08:2003:3f::230"))
    assert(isValidIpv6("2001:db8:0:0:0:0:2:1"))
    assert(isValidIpv6("::ffff:192.168.1.1"))
    assert(isValidIpv6("1:2:3:4:5:6:7:8"))
    assert(!isValidIpv6("1:2:3:4:5:6:7:8:9"))
    assert(!isValidIpv6("1:2:3:4:5:6:7"))
    assert(!isValidIpv6("2001:::1:2"))    // post-collapse double-:: handled upstream
    assert(!isValidIpv6("g::1"))
    assert(!isValidIpv6("12345::1"))
    assert(!isValidIpv6("1::2::3"))
  }

  test("normalizeIp collapses ::: and validates") {
    assert(normalizeIp("2001:4c08:2003:3f:::230") == "2001:4c08:2003:3f::230")
    assert(normalizeIp("4.34.58.34") == "4.34.58.34")
    assert(normalizeIp("") == "")
    assert(normalizeIp("ALL0") == "")
    assert(normalizeIp(null) == "")
  }

  test("canonicalIp: RFC 5952 parity with Go's net.IP.String forms") {
    // case folding and leading zeros
    assert(canonicalIp("2001:0DB8::1") == "2001:db8::1")
    assert(canonicalIp("2001:DB8:0:0:0:0:0:1") == "2001:db8::1")
    assert(canonicalIp("2001:db8:00aa:0:0:0:0:1") == "2001:db8:aa::1")
    // longest run wins; leftmost on ties; single zero group NOT collapsed
    assert(canonicalIp("2001:db8:0:0:1:0:0:1") == "2001:db8::1:0:0:1")
    assert(canonicalIp("2001:db8:0:1:1:1:1:1") == "2001:db8:0:1:1:1:1:1")
    assert(canonicalIp("1:0:0:0:0:0:0:0") == "1::")
    assert(canonicalIp("0:0:0:0:0:0:0:0") == "::")
    assert(canonicalIp("::1") == "::1")
    // v4-mapped prints as its dotted quad (Go To4() behavior)
    assert(canonicalIp("::ffff:1.2.3.4") == "1.2.3.4")
    // v4-compatible (not mapped) stays hex with the v4 tail folded
    assert(canonicalIp("::1.2.3.4") == "::102:304")
    // already canonical stays put
    assert(canonicalIp("2001:4c08:2003:2::148") == "2001:4c08:2003:2::148")
    // the sidestream ::: quirk collapses first, then canonicalizes
    assert(canonicalIp("2001:4c08:2003:3f:::230") == "2001:4c08:2003:3f::230")
    // v4 and invalid inputs ride the normalizeIp behavior
    assert(canonicalIp("4.34.58.34") == "4.34.58.34")
    assert(canonicalIp("not an ip") == "")
    assert(canonicalIp("") == "")
  }

  test("canonicalIp is idempotent over the whitelist fixture forms") {
    val src = scala.io.Source.fromFile("/root/repo/testdata/whitelist_full")
    val ips = try src.getLines().map(_.trim).filter(_.nonEmpty).toList finally src.close()
    ips.foreach { ip =>
      val c = canonicalIp(ip)
      assert(c.nonEmpty, s"fixture IP rejected: $ip")
      assert(canonicalIp(c) == c, s"not idempotent: $ip -> $c")
    }
  }

  test("property: valid IPv4 roundtrips unchanged (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val ip = Seq.fill(4)(rnd.nextInt(256)).mkString(".")
      assert(normalizeIp(ip) == ip)
      assert(extractLocalIp(s"20170225T23:00:00Z_${ip}_0.web100") == ip)
    }
  }

  test("property: extractLocalIp never throws, always returns non-null (seeded)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val len = rnd.nextInt(40)
      val s = Seq.fill(len)((rnd.nextInt(95) + 32).toChar).mkString
      assert(extractLocalIp(s) != null)
    }
  }
}
