package graft.cli

import org.scalatest.funsuite.AnyFunSuite

class YamlConfigSpec extends AnyFunSuite {

  test("scalars, quotes, comments, blank lines") {
    val Right(kv) = YamlConfig.parse(
      """# header comment
        |slot: my_slot
        |
        |host: "10.0.0.1"   # inline comment
        |password: 'p # not-a-comment'
        |workers: 4
        |""".stripMargin): @unchecked
    assert(kv == Seq(
      "slot" -> Seq("my_slot"),
      "host" -> Seq("10.0.0.1"),
      "password" -> Seq("p # not-a-comment"),
      "workers" -> Seq("4")))
  }

  test("block lists and inline lists") {
    val Right(kv) = YamlConfig.parse(
      """whitelist:
        |  - public.users
        |
        |  - public.orders
        |blacklist-regex: [^a$, '^b$']
        |slot: s
        |""".stripMargin): @unchecked
    assert(kv == Seq(
      "whitelist" -> Seq("public.users", "public.orders"),
      "blacklist-regex" -> Seq("^a$", "^b$"),
      "slot" -> Seq("s")))
  }

  test("inline lists keep quoted commas whole (regex quantifiers)") {
    val Right(kv) = YamlConfig.parse(
      """blacklist-regex: ['^tmp_{1,3}$', "^a{2,}b$", plain]
        |empty: []
        |""".stripMargin): @unchecked
    assert(kv == Seq(
      "blacklist-regex" -> Seq("^tmp_{1,3}$", "^a{2,}b$", "plain"),
      "empty" -> Seq()))
    val Left(e) = YamlConfig.parse("x: ['unclosed, oops]\n"): @unchecked
    assert(e.contains("unterminated"))
  }

  test("errors carry line numbers and reject unsupported constructs") {
    def err(s: String): String = YamlConfig.parse(s).left.toOption.get
    assert(err("whitelist:\n").contains("has no value"))
    assert(err("- floating item\n").contains("without a preceding"))
    assert(err("nested map: ok\n").contains("bad key"))
    assert(err("x: [a, b\n").contains("unterminated"))
    assert(err("slot: a\n---\nslot: b\n").contains("multi-document"))
    assert(err("whitelist:\n  -\n").contains("empty list item"))
    assert(err(": novalue\n").contains("expected 'key: value'"))
  }
}
