package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IPv4 address column functions.
  *
  * The reference converts dotted-quad IPv4 strings to 32-bit integers for
  * binary-search range lookups (`/root/reference/bin/ipinfo.py:33-41`) and
  * validates addresses with `ipaddress.ip_address`. Here the conversion is a
  * pure column-expression combo (whole-stage-codegen'd by Catalyst — no UDF),
  * so predicate pushdown and constant folding still apply around it.
  */
object IpFunctions {

  /** Strict IPv4 dotted-quad shape: four 1-3 digit octets. Range (0-255) is
    * checked separately by [[isValidIpv4]] so the regex stays RE2-simple.
    */
  private val Ipv4Shape = "^[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}$"

  private def octet(ip: Column, i: Int): Column =
    element_at(split(ip, "\\."), i).cast("long")

  /** Dotted quad -> 32-bit value carried in a Long (unsigned-safe).
    * Null for malformed input (mirrors ref's None on ValueError,
    * ipinfo.py:33-41).
    */
  def ipToInt(ip: Column): Column =
    when(isValidIpv4(ip),
      octet(ip, 1) * 16777216L + octet(ip, 2) * 65536L +
        octet(ip, 3) * 256L + octet(ip, 4))

  /** Inverse of [[ipToInt]]: Long -> dotted quad string. */
  def intToIp(v: Column): Column = {
    val x = v.cast("long")
    concat_ws(".",
      ((x / 16777216L) % 256L).cast("string"),
      ((x / 65536L) % 256L).cast("string"),
      ((x / 256L) % 256L).cast("string"),
      (x % 256L).cast("string"))
  }

  /** Validity predicate: shape + every octet <= 255. */
  def isValidIpv4(ip: Column): Column =
    ip.isNotNull && ip.rlike(Ipv4Shape) &&
      octet(ip, 1) <= 255 && octet(ip, 2) <= 255 &&
      octet(ip, 3) <= 255 && octet(ip, 4) <= 255
}
