package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.GeoFunctions

/** Mirrors the reference behavior matrix
  * (`test/unit/extract-load-service.test.ts:750-1218`) 1:1, plus
  * property tests for the recursive coordinate rewrite.
  */
class GeoFunctionsSpec extends AnyFunSuite {

  /** Deterministic forAll over a Gen (scalatestplus not available offline). */
  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val M = new ObjectMapper()
  private def j(s: String) = M.readTree(s)
  private def pg(feature: String, layer: String) =
    j(GeoFunctions.processGeometry(feature, layer))

  private def feature(geomType: String, coords: String, props: String = "{}") =
    s"""{"type":"Feature","geometry":{"type":"$geomType","coordinates":$coords},"properties":$props}"""

  test("nodes: 3D Point strips Z and records ext:elevation") {
    val out = pg(feature("Point", "[-122.1355703, 47.6458165, 123.45]"), "nodes")
    assert(out.at("/geometry/coordinates") == j("[-122.1355703, 47.6458165]"))
    assert(out.at("/properties/ext:elevation").asDouble == 123.45)
  }

  test("nodes: Z == 0 strips but records NO elevation") {
    val out = pg(feature("Point", "[-122.1, 47.6, 0]"), "nodes")
    assert(out.at("/geometry/coordinates") == j("[-122.1, 47.6]"))
    assert(out.at("/properties/ext:elevation").isMissingNode)
  }

  test("nodes: existing ext:elevation → new value lands in ext:elevation_1") {
    val out = pg(
      feature("Point", "[1.0, 2.0, 55.5]", """{"ext:elevation": 11.0}"""),
      "nodes")
    assert(out.at("/properties/ext:elevation").asDouble == 11.0)
    assert(out.at("/properties/ext:elevation_1").asDouble == 55.5)
  }

  test("nodes: two existing ext:elevation* keys → suffix _2") {
    val out = pg(
      feature("Point", "[1.0, 2.0, 99.0]",
        """{"ext:elevation": 1.0, "ext:elevation_1": 2.0}"""),
      "nodes")
    assert(out.at("/properties/ext:elevation_2").asDouble == 99.0)
  }

  test("nodes: 2D Point passes through unchanged, no elevation") {
    val in = feature("Point", "[-122.1, 47.6]")
    val out = pg(in, "nodes")
    assert(out.at("/geometry/coordinates") == j("[-122.1, 47.6]"))
    assert(out.at("/properties/ext:elevation").isMissingNode)
  }

  test("points layer behaves like nodes (elevation extracted)") {
    val out = pg(feature("Point", "[1.5, 2.5, 30.25]"), "points")
    assert(out.at("/properties/ext:elevation").asDouble == 30.25)
  }

  test("edges: 3D LineString strips Z at depth 2, records NO elevation") {
    val out = pg(
      feature("LineString", "[[-122.1, 47.6, 100.0], [-122.2, 47.7, 200.0]]"),
      "edges")
    assert(out.at("/geometry/coordinates") ==
      j("[[-122.1, 47.6], [-122.2, 47.7]]"))
    assert(out.at("/properties/ext:elevation").isMissingNode)
  }

  test("edges: mixed 2D/3D LineString → all positions rewritten to 2D") {
    val out = pg(
      feature("LineString", "[[1.0, 2.0], [3.0, 4.0, 5.0], [6.0, 7.0]]"),
      "edges")
    assert(out.at("/geometry/coordinates") ==
      j("[[1.0, 2.0], [3.0, 4.0], [6.0, 7.0]]"))
  }

  test("polygons: depth-3 strip") {
    val out = pg(
      feature("Polygon",
        "[[[0.0, 0.0, 9.0], [1.0, 0.0, 9.0], [1.0, 1.0, 9.0], [0.0, 0.0, 9.0]]]"),
      "polygons")
    assert(out.at("/geometry/coordinates") ==
      j("[[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]]"))
  }

  test("zones: MultiPolygon depth-4 strip") {
    val out = pg(
      feature("MultiPolygon",
        "[[[[0.0, 0.0, 1.0], [1.0, 0.0, 2.0], [0.0, 1.0, 3.0], [0.0, 0.0, 1.0]]]]"),
      "zones")
    assert(out.at("/geometry/coordinates") ==
      j("[[[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 0.0]]]]"))
  }

  test("extension: MultiLineString stripped, no elevation") {
    val out = pg(
      feature("MultiLineString", "[[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]]"),
      "extension")
    assert(out.at("/geometry/coordinates") == j("[[[1.0, 2.0], [4.0, 5.0]]]"))
    assert(out.at("/properties/ext:elevation").isMissingNode)
  }

  test("nodes: first-found elevation is depth-first across a MultiPoint") {
    val out = pg(
      feature("MultiPoint", "[[1.0, 2.0], [3.0, 4.0, 77.0], [5.0, 6.0, 88.0]]"),
      "nodes")
    assert(out.at("/properties/ext:elevation").asDouble == 77.0)
  }

  test("feature with no geometry passes through byte-identical") {
    val in = """{"type":"Feature","properties":{"_id":"n1"}}"""
    assert(GeoFunctions.processGeometry(in, "nodes") == in)
  }

  test("coordinates: null passes through byte-identical") {
    val in = feature("Point", "null")
    assert(GeoFunctions.processGeometry(in, "nodes") == in)
  }

  test("malformed JSON passes through unchanged (errors swallowed)") {
    val in = """{"type":"Feature","geometry":{"#broken"""
    assert(GeoFunctions.processGeometry(in, "nodes") == in)
  }

  test("position with trailing non-number junk keeps only [x, y]") {
    val out = pg(feature("Point", "[1.0, 2.0, [3.0, 4.0]]"), "edges")
    assert(out.at("/geometry/coordinates") == j("[1.0, 2.0]"))
  }

  test("missing properties object is created for elevation") {
    val in = """{"type":"Feature","geometry":{"type":"Point","coordinates":[1.0,2.0,3.5]}}"""
    val out = pg(in, "nodes")
    assert(out.at("/properties/ext:elevation").asDouble == 3.5)
  }

  test("integer elevation round-trips as integer (no .0 added)") {
    val out = GeoFunctions.processGeometry(
      feature("Point", "[1.5, 2.5, 123]"), "nodes")
    assert(out.contains(""""ext:elevation":123""") && !out.contains("123.0"))
  }

  test("non-array, truthy coordinates pass through (string coords)") {
    val in = feature("Point", "\"abc\"")
    val out = pg(in, "edges")
    assert(out.at("/geometry/coordinates").asText == "abc")
  }

  // --- property tests ----------------------------------------------------

  /** Random coordinate trees: numbers, positions, and nested arrays. */
  private val numGen = Gen.chooseNum(-180.0, 180.0)
  private def treeGen(depth: Int): Gen[String] =
    if (depth == 0)
      Gen.nonEmptyListOf(numGen).map(ns => ns.mkString("[", ",", "]"))
    else
      Gen.oneOf(
        Gen.nonEmptyListOf(numGen).map(ns => ns.mkString("[", ",", "]")),
        Gen.resize(4, Gen.nonEmptyListOf(treeGen(depth - 1)))
          .map(ts => ts.mkString("[", ",", "]"))
      )

  test("property: stripZ is idempotent") {
    forAll(treeGen(3)) { coords =>
      val once = GeoFunctions.stripZ(j(coords))
      val twice = GeoFunctions.stripZ(once)
      assert(once == twice)
    }
  }

  test("property: single-pass strip equals two-pass strip") {
    forAll(treeGen(3)) { coords =>
      val (single, _) = GeoFunctions.stripZExtractElevation(j(coords))
      assert(single == GeoFunctions.stripZ(j(coords)))
    }
  }

  test("property: extracted elevation matches an independent reference walk") {
    // independent depth-first walker over the parsed tree
    def refFirstZ(n: com.fasterxml.jackson.databind.JsonNode): Option[Double] = {
      if (!n.isArray) return None
      if (n.size >= 2 && n.get(0).isNumber && n.get(1).isNumber)
        return if (n.size >= 3 && n.get(2).isNumber) Some(n.get(2).asDouble) else None
      var found: Option[Double] = None
      var i = 0
      while (i < n.size && found.isEmpty) { found = refFirstZ(n.get(i)); i += 1 }
      found
    }
    forAll(treeGen(3)) { coords =>
      val (_, e) = GeoFunctions.stripZExtractElevation(j(coords))
      assert(e.map(_.asDouble) == refFirstZ(j(coords)))
    }
  }
}
