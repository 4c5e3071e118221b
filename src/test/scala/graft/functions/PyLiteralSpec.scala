package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.PropSampling.sample

/** PyLiteral → JSON parser (reference F12/F13: `ast.literal_eval` of
  * repr() strings embedded in CSV — `crawler/download.py:223-230`,
  * `crawler/metadata.py:261-266`). Malformed input → null, mirroring
  * the reference's except→None tolerance. */
class PyLiteralSpec extends AnyFunSuite {

  test("scalar literals") {
    assert(PyLiteral.toJson("'abc'") == "\"abc\"")
    assert(PyLiteral.toJson("\"abc\"") == "\"abc\"")
    assert(PyLiteral.toJson("42") == "42")
    assert(PyLiteral.toJson("-3.5") == "-3.5")
    assert(PyLiteral.toJson("1e3") == "1e3")
    assert(PyLiteral.toJson("True") == "true")
    assert(PyLiteral.toJson("False") == "false")
    assert(PyLiteral.toJson("None") == "null")
  }

  test("lists, tuples, dicts, nesting") {
    assert(PyLiteral.toJson("['a', 'b']") == "[\"a\",\"b\"]")
    assert(PyLiteral.toJson("('a', 1)") == "[\"a\",1]")
    assert(PyLiteral.toJson("[]") == "[]")
    assert(PyLiteral.toJson("{}") == "{}")
    assert(PyLiteral.toJson("{'name': 'X', 'url': None}") == "{\"name\":\"X\",\"url\":null}")
    assert(PyLiteral.toJson("[{'a': [1, 2]}, {'b': (3,)}]") == "[{\"a\":[1,2]},{\"b\":[3]}]")
    // trailing comma (python allows it)
    assert(PyLiteral.toJson("[1, 2,]") == "[1,2]")
  }

  test("quoting and escapes") {
    // single-quoted string containing a double quote -> escaped in JSON
    assert(PyLiteral.toJson("""'say "hi"'""") == """"say \"hi\""""")
    // escaped single quote inside single quotes (python repr form)
    assert(PyLiteral.toJson("""'it\'s'""") == "\"it's\"")
    assert(PyLiteral.toJson("""'tab\there'""") == "\"tab\\there\"")
    assert(PyLiteral.toJson("'\\u00e9'") == "\"\\u00e9\"")
    assert(PyLiteral.toJson("'\\xe9'") == "\"\\u00e9\"")
    // unicode passes through
    assert(PyLiteral.toJson("'Tiếng Việt'") == "\"Tiếng Việt\"")
  }

  test("malformed input returns null") {
    for (bad <- Seq("", "[1", "{'a' 1}", "nope", "'unclosed", "[1,2] trailing",
                    "{'a': }", "{1: 2}", "--3", "[,]"))
      assert(PyLiteral.toJson(bad) == null, s"input: $bad")
    assert(PyLiteral.toJson(null) == null)
  }

  test("generated url-list literals round-trip through a JSON parser") {
    // The reference's dominant shape: a python list of url strings.
    val url = Gen.nonEmptyListOf(Gen.alphaNumChar).map(cs => s"https://x/${cs.mkString}.mp3")
    val lst = Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, url))
    for (urls <- sample(lst, 100)) {
      val py = urls.map(u => s"'$u'").mkString("[", ", ", "]")
      val js = PyLiteral.toJson(py)
      assert(js == urls.map(u => s""""$u"""").mkString("[", ",", "]"))
    }
  }

  test("generated narrator dict-list literals parse") {
    val name = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    val narr = name.map(n => s"{'name': '$n', 'url': 'https://x/$n'}")
    val lst = Gen.choose(1, 4).flatMap(k => Gen.listOfN(k, narr))
    for (ds <- sample(lst, 100)) {
      val py = ds.mkString("[", ", ", "]")
      val js = PyLiteral.toJson(py)
      assert(js != null && js.startsWith("[{\"name\":"))
    }
  }
}
