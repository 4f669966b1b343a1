package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.geom.GeneralIntersect

/** Unit cases for the exact-rational slab intersection kernel
  * (geom/GeneralIntersectRings.scala) — each expected ring computed by
  * hand. Covers the shapes a Sutherland–Hodgman ring can never express
  * (disconnected components, holes) and the degeneracies that break a
  * naive Weiler–Atherton (tangency, collinear A/B boundary overlap). */
class GeneralIntersectSpec extends AnyFunSuite with SharedSpark {

  private def edges(pts: (Double, Double)*): GenericArrayData =
    new GenericArrayData(pts.indices.map { i =>
      val (x0, y0) = pts(i)
      val (x1, y1) = pts((i + 1) % pts.length)
      InternalRow(x0, y0, x1, y1)
    }.toArray[Any])

  private def cat(a: GenericArrayData, b: GenericArrayData): GenericArrayData =
    new GenericArrayData(a.array ++ b.array)

  private def rows(r: org.apache.spark.sql.catalyst.util.ArrayData)
      : Seq[(Int, Int, Double, Double)] =
    (0 until r.numElements()).map { i =>
      val s = r.getStruct(i, 4)
      (s.getInt(0), s.getInt(1), s.getDouble(2), s.getDouble(3))
    }

  private def box(x0: Double, y0: Double, x1: Double, y1: Double) =
    edges((x0, y0), (x1, y0), (x1, y1), (x0, y1))

  test("overlapping boxes: one CCW ring from the min corner") {
    val r = rows(GeneralIntersect.intersectRings(
      box(0, 0, 4, 4), box(2, 2, 6, 6)))
    assert(r === Seq((0, 0, 2.0, 2.0), (0, 1, 4.0, 2.0),
      (0, 2, 4.0, 4.0), (0, 3, 2.0, 4.0)))
  }

  test("notched pentagon x band: two components, rational corners") {
    // pentagon (0,0)(20,0)(20,20)(10,5)(0,20); band y in [8,12]
    val pent = edges((0, 0), (20, 0), (20, 20), (10, 5), (0, 20))
    val band = box(-2, 8, 22, 12)
    val r = rows(GeneralIntersect.intersectRings(pent, band))
    val left = Seq((0, 0, 0.0, 8.0), (0, 1, 8.0, 8.0),
      (0, 2, 16.0 / 3.0, 12.0), (0, 3, 0.0, 12.0))
    val right = Seq((1, 0, 12.0, 8.0), (1, 1, 20.0, 8.0),
      (1, 2, 20.0, 12.0), (1, 3, 44.0 / 3.0, 12.0))
    assert(r === left ++ right)
  }

  test("hole in the subject survives into the intersection as a CW ring") {
    val subj = cat(box(0, 0, 12, 12), box(4, 4, 8, 8)) // outer + hole
    val r = rows(GeneralIntersect.intersectRings(subj, box(-2, -2, 14, 14)))
    val outer = Seq((0, 0, 0.0, 0.0), (0, 1, 12.0, 0.0),
      (0, 2, 12.0, 12.0), (0, 3, 0.0, 12.0))
    val hole = Seq((1, 0, 4.0, 4.0), (1, 1, 4.0, 8.0),
      (1, 2, 8.0, 8.0), (1, 3, 8.0, 4.0))
    assert(r === outer ++ hole)
    // signed shoelace: outer CCW positive, hole CW negative -> 144 - 16
    def signedArea(vs: Seq[(Int, Int, Double, Double)]): Double =
      vs.indices.map { i =>
        val (_, _, x0, y0) = vs(i); val (_, _, x1, y1) = vs((i + 1) % vs.length)
        x0 * y1 - x1 * y0
      }.sum / 2.0
    assert(signedArea(r.take(4)) === 144.0 && signedArea(r.drop(4)) === -16.0)
  }

  test("edge tangency only: empty result, not a degenerate ring") {
    assert(rows(GeneralIntersect.intersectRings(
      box(0, 0, 4, 4), box(4, 0, 8, 4))).isEmpty)
    // corner tangency likewise
    assert(rows(GeneralIntersect.intersectRings(
      box(0, 0, 4, 4), box(4, 4, 8, 8))).isEmpty)
  }

  test("collinear hypotenuse overlap: boundary shared by both polygons") {
    // both right triangles lean on x + y = 8; intersection is the
    // triangle (2,0)(8,0)(2,6) with the shared slant boundary
    val ta = edges((0, 0), (8, 0), (0, 8))
    val tb = edges((2, -2), (10, -2), (2, 6))
    val r = rows(GeneralIntersect.intersectRings(ta, tb))
    assert(r === Seq((0, 0, 2.0, 0.0), (0, 1, 8.0, 0.0), (0, 2, 2.0, 6.0)))
  }

  test("vertex-on-edge incidence resolves without general position") {
    // B's corner (4,4) sits ON A's top edge y=4
    val r = rows(GeneralIntersect.intersectRings(
      box(0, 0, 8, 4), box(4, 4, 12, 8)))
    assert(r.isEmpty) // touch only
    val r2 = rows(GeneralIntersect.intersectRings(
      box(0, 0, 8, 4), box(4, 2, 12, 8))) // B corner inside, crossing at edge
    assert(r2 === Seq((0, 0, 4.0, 2.0), (0, 1, 8.0, 2.0),
      (0, 2, 8.0, 4.0), (0, 3, 4.0, 4.0)))
  }

  test("non-integer coordinates refuse loudly") {
    val e = intercept[IllegalArgumentException] {
      GeneralIntersect.intersectRings(box(0.5, 0, 4, 4), box(2, 2, 6, 6))
    }
    assert(e.getMessage.contains("whole numbers"))
  }
}
