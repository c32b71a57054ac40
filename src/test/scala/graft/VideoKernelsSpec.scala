package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VideoKernels

class VideoKernelsSpec extends AnyFunSuite {

  /** Hand-built GIF89a: header + LSD, frames as (delayOrNone, dataLen),
    * optional global table, optional local table per frame.
    */
  private def gif(
      w: Int, h: Int,
      frames: Seq[(Option[Int], Int)],
      gct: Boolean = false,
      lct: Boolean = false,
      trailer: Boolean = true): Array[Byte] = {
    def le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    b ++= "GIF89a".getBytes
    b ++= le(w); b ++= le(h)
    b += (if (gct) 0x81.toByte else 0x00.toByte); b += 0; b += 0
    if (gct) b ++= Array.fill(12)(0x1c.toByte)
    frames.foreach { case (delay, dataLen) =>
      delay.foreach { d =>
        b ++= Array(0x21.toByte, 0xf9.toByte, 4.toByte, 0.toByte)
        b ++= le(d); b += 0; b += 0
      }
      b += 0x2c.toByte
      b ++= le(0); b ++= le(0); b ++= le(w); b ++= le(h)
      b += (if (lct) 0x81.toByte else 0x00.toByte)
      if (lct) b ++= Array.fill(12)(0x2d.toByte)
      b += 2 // LZW min code size
      b += dataLen.toByte; b ++= Array.fill(dataLen)(0xab.toByte); b += 0
    }
    if (trailer) b += 0x3b.toByte
    b.toArray
  }

  private def meta(bytes: Array[Byte]) = {
    val r = VideoKernels.gifFrames(bytes)
    if (r.isNullAt(2)) None
    else Some((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getArray(4).toLongArray.toSeq))
  }

  test("frame walk: counts frames, attributes each GCE delay to ITS frame") {
    val got = meta(gif(64, 32, Seq(Some(10) -> 3, Some(25) -> 1, None -> 2)))
    assert(got.contains((64L, 32L, 3L, 35L, Seq(10L, 25L, 0L))),
      s"got $got — a frame without a graphic-control extension has delay 0")
  }

  test("frame walk: global and local color tables are skipped by their descriptor bits") {
    val plain = meta(gif(20, 20, Seq(Some(5) -> 2, Some(7) -> 4)))
    assert(plain == meta(gif(20, 20, Seq(Some(5) -> 2, Some(7) -> 4), gct = true)))
    assert(plain == meta(gif(20, 20, Seq(Some(5) -> 2, Some(7) -> 4), lct = true)))
    assert(plain == meta(gif(20, 20, Seq(Some(5) -> 2, Some(7) -> 4), gct = true, lct = true)))
  }

  test("frame walk: classification, not exceptions") {
    assert(meta("NOTAGIF".getBytes).isEmpty)
    assert(meta(Array.emptyByteArray).isEmpty)
    // missing trailer = truncated stream
    assert(meta(gif(8, 8, Seq(Some(5) -> 2), trailer = false)).isEmpty)
    // truncated mid-frame
    assert(meta(gif(8, 8, Seq(Some(5) -> 200)).dropRight(150)).isEmpty)
    // an unknown block type must classify, never walk blind
    val bad = gif(8, 8, Seq(Some(5) -> 2))
    bad(13) = 0x7f.toByte // first block byte → garbage
    assert(meta(bad).isEmpty)
    // zero frames (header straight to trailer) is a VALID, empty animation
    assert(meta(gif(8, 8, Nil)).contains((8L, 8L, 0L, 0L, Seq.empty[Long])))
  }
}
