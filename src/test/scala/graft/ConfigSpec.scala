package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("absent file yields all defaults") {
    val c = Config.load(java.nio.file.Paths.get("/nonexistent/x.conf"))
    assert(c.dnsCacheSize == 128)
    assert(c.dnsCacheTtl == 3600L)
    assert(c.reportRecipient == "")
    assert(c.getBoolean("x", "y", default = true))
  }

  test("valid file parses sections, comments, and values") {
    val f = Files.createTempFile("graft", ".conf")
    Files.write(f,
      """# comment
        |[dns_cache]
        |size = 64
        |ttl = 60
        |; another comment
        |[report]
        |email = ops@example.com
        |enabled = yes
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val c = Config.load(f)
    assert(c.dnsCacheSize == 64)
    assert(c.dnsCacheTtl == 60L)
    assert(c.reportRecipient == "ops@example.com")
    assert(c.getBoolean("report", "enabled", default = false))
    assert(c.sections("dns_cache") == Map("size" -> "64", "ttl" -> "60"))
  }

  test("invalid values fall back to defaults; malformed lines skipped") {
    val f = Files.createTempFile("graft", ".conf")
    Files.write(f,
      """[dns_cache]
        |size = not-a-number
        |this line has no equals sign
        |ttl = -5x
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val c = Config.load(f)
    assert(c.dnsCacheSize == 128)
    assert(c.dnsCacheTtl == 3600L)
  }
}
