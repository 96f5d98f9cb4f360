package graft.operators

import graft.SparkSpec

class WlRefinementSpec extends SparkSpec {
  import spark.implicits._

  // path a-b-c-d plus a triangle e-f-g: after 1-WL refinement the path
  // endpoints {a, d} share a color, the path middles {b, c} share one,
  // and the triangle {e, f, g} (vertex-transitive) stays a single class
  // distinct from everything on the path.
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), // path a=1 b=2 c=3 d=4
    (5L, 6L), (6L, 7L), (5L, 7L)  // triangle e=5 f=6 g=7
  ).toDF("src", "dst")

  test("WL classes separate path ends, path middles, and the triangle") {
    val out = Graphs.wlRefinement(edges, rounds = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out.size == 7)
    assert(out(1L)._1 == out(4L)._1, "path endpoints agree")
    assert(out(2L)._1 == out(3L)._1, "path middles agree")
    assert(out(5L)._1 == out(6L)._1 && out(6L)._1 == out(7L)._1,
      "triangle is one class")
    val classes = Set(out(1L)._1, out(2L)._1, out(5L)._1)
    assert(classes.size == 3, "three distinct classes")
    assert(out(1L)._2 == 2L && out(2L)._2 == 2L && out(5L)._2 == 3L,
      "class sizes")
  }

  test("WL is stable under input edge orientation and row order") {
    val flipped = Seq(
      (7L, 5L), (6L, 7L), (6L, 5L),
      (4L, 3L), (2L, 1L), (3L, 2L)
    ).toDF("src", "dst")
    val a = Graphs.wlRefinement(edges, rounds = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getString(1)))
    val b = Graphs.wlRefinement(flipped, rounds = 3)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sameElements(b))
  }

  test("rich club: K4 plus a pendant gives phi(2)=1 and empty high clubs") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("src", "dst")
    val out = Graphs.richClub(g)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // deg: 1 -> 4, {2,3,4} -> 3, 5 -> 1
    assert(out(2L) == ((4L, 6L, Some(1.0))), "k=2: the K4 is a full club")
    assert(out(4L) == ((0L, 0L, None)), "k=4: nobody exceeds degree 4")
    assert(out(8L) == ((0L, 0L, None)) && out(16L) == ((0L, 0L, None)))
  }

  test("degree-1 start: a star's center and leaves split immediately") {
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L)).toDF("src", "dst")
    val out = Graphs.wlRefinement(star, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(11L) == out(12L) && out(12L) == out(13L))
    assert(out(10L) != out(11L))
  }
}
