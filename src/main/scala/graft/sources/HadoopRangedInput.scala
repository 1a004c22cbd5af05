package graft.sources

import org.apache.hadoop.fs.FSDataInputStream

import graft.sources.jp2.Jp2Codec

/** [[Jp2Codec.RangedInput]] over an open Hadoop stream: each read
  * fetches exactly [pos, pos+len) via the positioned-read API (no seek
  * state, thread-safe) — the executor-side primitive that lets a split
  * task walk a gigabyte scan's headers without materializing the file.
  * The `binaryFile` alternative loads the whole file as one row and
  * hard-caps at 2 GiB — exactly what a header walk must not do at the
  * archival scale where single page scans are gigabytes.
  *
  * The caller owns the stream's lifecycle (open once per file, close in
  * `finally`); `length` is the file status length the listing already
  * carries, so no extra namenode round-trip is paid here.
  */
final class HadoopRangedInput(in: FSDataInputStream, val length: Long)
    extends Jp2Codec.RangedInput {
  def read(pos: Long, len: Int): Array[Byte] = {
    checkRange(pos, len)
    val a = new Array[Byte](len)
    in.readFully(pos, a)
    a
  }
}
