package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geohash

class GeohashSpec extends AnyFunSuite {

  private def randomPoints(n: Int, seed: Long = 42): Seq[(Double, Double)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((-89.99 + rnd.nextDouble() * 179.98, -179.99 + rnd.nextDouble() * 359.98))
  }

  test("encode/decode round trip: decoded bbox contains the point") {
    for (((lat, lon), i) <- randomPoints(300).zipWithIndex) {
      val len = 1 + (i % 12)
      val h = Geohash.encode(lat, lon, len)
      assert(h.length == len)
      assert(Geohash.contains(h, lat, lon), s"($lat,$lon) not in $h")
    }
  }

  test("center of a cell re-encodes to the same hash") {
    for (((lat, lon), i) <- randomPoints(300, seed = 7).zipWithIndex) {
      val len = 1 + (i % 10)
      val h = Geohash.encode(lat, lon, len)
      val (clat, clon) = Geohash.decodeCenter(h)
      assert(Geohash.encode(clat, clon, len) == h)
    }
  }

  test("known geohash values from the reference README decode consistently") {
    // reference README.md:12-17 readings carry geohashes near Antwerp (u155...)
    val (lat, lon) = Geohash.decodeCenter("u155mz82dv33")
    assert(lat > 51.0 && lat < 51.5, s"lat $lat")
    assert(lon > 4.0 && lon < 4.7, s"lon $lon")
    assert(Geohash.encode(lat, lon, 6) == "u155mz")
    assert(Geohash.encode(lat, lon, 12) == "u155mz82dv33")
  }

  test("prefix is spatial containment: longer hash lies inside shorter cell") {
    for (((lat, lon), i) <- randomPoints(200, seed = 13).zipWithIndex) {
      val len = 1 + (i % 6)
      val parent = Geohash.encode(lat, lon, len)
      val child = Geohash.encode(lat, lon, len + 3)
      assert(child.startsWith(parent))
    }
  }

  test("successor: h in [p, succ(p)) iff h startsWith p (string order)") {
    for (((lat, lon), i) <- randomPoints(200, seed = 99).zipWithIndex) {
      val pl = 1 + (i % 5)
      val h = Geohash.encode(lat, lon, 6 + (i % 3))
      val p = Geohash.encode(lat, lon, pl) // guaranteed prefix of h
      Geohash.successor(p) match {
        case Some(s) => assert(h >= p && h < s, s"$h not in [$p, $s)")
        case None    => assert(h >= p) // all-'z' prefix: open-ended range
      }
    }
  }

  test("successor handles trailing z and all-z") {
    assert(Geohash.successor("u1z").contains("u2"))
    assert(Geohash.successor("zz").isEmpty)
    assert(Geohash.successor("9").contains("b")) // base32 alphabet skip
  }

  test("coverBoundingBox covers every point inside the bbox") {
    val boxes = Seq(
      // reference README.md:115 example bbox (Antwerp region)
      (51.32288838086245, 4.091720581054688, 51.1509246836981, 4.752960205078125),
      (10.0, 10.0, 5.0, 20.0),
      (-5.0, -100.0, -30.0, -60.0))
    for ((n, w, s, e) <- boxes) {
      val cover = Geohash.coverBoundingBox(n, w, s, e)
      assert(cover.nonEmpty && cover.size <= 12)
      val rnd = new scala.util.Random(42)
      for (_ <- 1 to 200) {
        val lat = s + rnd.nextDouble() * (n - s)
        val lon = w + rnd.nextDouble() * (e - w)
        val h = Geohash.encode(lat, lon, 8)
        assert(cover.exists(h.startsWith),
          s"point ($lat,$lon) hash $h not covered by $cover")
      }
    }
  }

  test("reference README snapshot results fall under the bbox cover") {
    // README.md:126-139: snapshot over the example bbox returns cells
    // u14fzp, u14gj2, u14gj6 ... — each must start with a cover prefix
    val cover = Geohash.coverBoundingBox(
      51.32288838086245, 4.091720581054688, 51.1509246836981, 4.752960205078125)
    for (gh <- Seq("u14fzp", "u14gj2", "u14gj6"))
      assert(cover.exists(gh.startsWith), s"$gh not under $cover")
  }

  test("width/height shrink with length and match decoded bbox size") {
    for (len <- 1 to 8) {
      val h = Geohash.encode(43.21, -71.56, len)
      val (latLo, latHi, lonLo, lonHi) = Geohash.decodeBbox(h)
      assert(math.abs((lonHi - lonLo) - Geohash.widthDegrees(len)) < 1e-9)
      assert(math.abs((latHi - latLo) - Geohash.heightDegrees(len)) < 1e-9)
    }
  }
}
