package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.serving.JsonBody

/** The shared anchored POST-body scanner (`serving/JsonBody`): one
  * tested implementation of key-anchored balanced-value extraction,
  * so endpoints cannot reintroduce the pre-anchor bug class (r13:
  * bare indexOf('[') matching a sibling key's array). Adversarial
  * bodies from the r13 review wave are pinned here. */
class JsonBodySpec extends AnyFunSuite {

  test("floatArrays binds to the KEY, never a sibling's array") {
    // sibling array AFTER vecs must not add phantom queries
    assert(JsonBody.floatArrays(
      """{"vecs":[[1,2]],"other":[[9,9],[8,8]]}""", "vecs")
      == Seq(Seq(1f, 2f)))
    // sibling array BEFORE vecs must not shadow it
    assert(JsonBody.floatArrays(
      """{"other":[[9,9]],"vecs":[[1,2],[3,4]]}""", "vecs")
      == Seq(Seq(1f, 2f), Seq(3f, 4f)))
    // the key name inside a STRING VALUE is not a key
    assert(JsonBody.floatArrays(
      """{"note":"say vecs here","vecs":[[5,6]]}""", "vecs")
      == Seq(Seq(5f, 6f)))
    // absent key = empty, not an error
    assert(JsonBody.floatArrays("""{"a":1}""", "vecs").isEmpty)
    assert(JsonBody.floatArrays("", "vecs").isEmpty)
  }

  test("whitespace, empties and malformed bodies") {
    assert(JsonBody.floatArrays(
      "{ \"vecs\" \n :\t [ [1.5 , -2 ] ,\n[3]] }", "vecs")
      == Seq(Seq(1.5f, -2f), Seq(3f)))
    assert(JsonBody.floatArrays("""{"vecs":[]}""", "vecs").isEmpty)
    // unbalanced array is LOUD (a 400, never a silent partial parse)
    intercept[IllegalArgumentException] {
      JsonBody.floatArrays("""{"vecs":[[1,2],[3""", "vecs")
    }
    // non-numeric components are loud (400): a quoted component is
    // rejected by the structural scan (strings are illegal in a vecs
    // span); a bare-word component still falls to toFloat's
    // NumberFormatException — both IllegalArgumentException → 400
    intercept[IllegalArgumentException] {
      JsonBody.floatArrays("""{"vecs":[[1,"x"]]}""", "vecs")
    }
    intercept[NumberFormatException] {
      JsonBody.floatArrays("""{"vecs":[[1,x]]}""", "vecs")
    }
  }

  test("bracket characters inside string values cannot unbalance the scan") {
    // a string payload containing ']' must not close the array early,
    // nor '[' open a phantom level; escaped quotes stay inside the
    // string
    assert(JsonBody.arraySpan(
      """{"tags":["a]b","c[d","e\"]f"],"vecs":[[1]]}""", "tags").nonEmpty)
    assert(JsonBody.floatArrays(
      """{"tags":["a]b[","\"x"],"vecs":[[7,8]]}""", "vecs")
      == Seq(Seq(7f, 8f)))
  }

  test("a same-named key NESTED in another object/array cannot hijack " +
      "the span — only the top-level member binds") {
    // the GDPR shape: deleting the wrong ids on a 200 is the worst
    // possible outcome of a parser bug
    assert(JsonBody.longArray(
      """{"meta":{"vecIds":[9]},"vecIds":[1,2]}""", "vecIds")
      == Seq(1L, 2L))
    assert(JsonBody.longArray(
      """{"vecIds":[1,2],"meta":{"vecIds":[9]}}""", "vecIds")
      == Seq(1L, 2L))
    // nested-ONLY occurrence = key absent at top level
    assert(JsonBody.longArray(
      """{"meta":{"vecIds":[9]}}""", "vecIds").isEmpty)
    assert(JsonBody.floatArrays(
      """{"wrap":[{"vecs":[[9,9]]}],"vecs":[[1,2]]}""", "vecs")
      == Seq(Seq(1f, 2f)))
    // a non-array top-level value for the key is loud, not a guess
    intercept[IllegalArgumentException] {
      JsonBody.longArray("""{"vecIds":"3,5"}""", "vecIds")
    }
  }

  test("floatArrays: over-nested bodies are LOUD, never silently " +
      "parsed as one query vector") {
    // {"vecs":[[[1,2]]]} used to regex-extract the innermost array as
    // a single query — a malformed client shape must 400 instead
    intercept[IllegalArgumentException] {
      JsonBody.floatArrays("""{"vecs":[[[1,2]]]}""", "vecs")
    }
    intercept[IllegalArgumentException] {
      JsonBody.floatArrays("""{"vecs":[[1,2],[[3,4]]]}""", "vecs")
    }
    // brackets inside STRING values do not count as nesting (the
    // depth check is string-aware like the span scan)
    assert(JsonBody.floatArrays(
      """{"tags":["[["],"vecs":[[1,2]]}""", "vecs")
      == Seq(Seq(1f, 2f)))
    // depth exactly 2 stays fine
    assert(JsonBody.floatArrays("""{"vecs":[[1],[2,3]]}""", "vecs")
      == Seq(Seq(1f), Seq(2f, 3f)))
    // OBJECT-wrapped arrays: '{' hides the true nesting from a bare
    // bracket count — must 400, never silently search [1,2]
    intercept[IllegalArgumentException] {
      JsonBody.floatArrays("""{"vecs":[{"v":[1,2]}]}""", "vecs")
    }
    // STRING literals inside the span: the extraction regex is not
    // string-aware, so "[3,4]" would become a phantom query — reject
    intercept[IllegalArgumentException] {
      JsonBody.floatArrays("""{"vecs":[[1,2],"[3,4]"]}""", "vecs")
    }
    // BARE components at the outer level would be silently dropped by
    // the bracketed-group extraction — depth exactly 2, loudly
    intercept[IllegalArgumentException] {
      JsonBody.floatArrays("""{"vecs":[1,2,[3,4]]}""", "vecs")
    }
    intercept[IllegalArgumentException] {
      JsonBody.floatArrays("""{"vecs":[1,2]}""", "vecs")
    }
  }

  test("longArray: flat ids only, loud on nesting") {
    assert(JsonBody.longArray("""{"vecIds":[3, 5 ,8]}""", "vecIds")
      == Seq(3L, 5L, 8L))
    assert(JsonBody.longArray("""{"vecIds":[]}""", "vecIds").isEmpty)
    assert(JsonBody.longArray("""{"x":[1]}""", "vecIds").isEmpty)
    intercept[IllegalArgumentException] {
      JsonBody.longArray("""{"vecIds":[[1],[2]]}""", "vecIds")
    }
    intercept[NumberFormatException] {
      JsonBody.longArray("""{"vecIds":[1,a]}""", "vecIds")
    }
  }
}
