package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import graft.operators.Sketches

/** Streaming twin of [[Sketches.hllSketch]] — the HLL register vector as
  * per-key `transformWithState` state, merged across micro-batches. This
  * is the shape the DWS UU windows take at 100 TB: instead of an exact
  * seen-key set per (window, group) — state proportional to distinct
  * keys — each key holds ONE fixed 64-int register vector, and register
  * point-max is associative/commutative, so arrival order and batch
  * boundaries can't change the result.
  *
  * The processor emits a (group, update_seq, registers) snapshot per
  * micro-batch it sees the key in; the LATEST snapshot (max update_seq)
  * is the sketch, and downstream digesting reuses the exact batch
  * column math ([[Sketches.hllStats]]), so the streaming path gates
  * against the same DuckDB oracle as the batch q81 — same registers,
  * same single division.
  *
  * (The reference has no sketch surface — SURVEY §2.5 "no HLL/approx" —
  * this extends the engine per the training-data-pipeline brief.)
  */
object SketchStream {

  /** One hashed observation: group, register index, rank (see
    * [[Sketches.hllObs]] — computed with the oracle-shared md5 split). */
  case class HllRow(g: String, bucket: Int, rho: Int)

  /** Per-group register state: fold the batch's observations by point
    * max, persist, emit the running sketch with an update sequence so
    * bounded consumers can pick each key's newest snapshot. */
  class HllSketchProcessor
      extends StatefulProcessor[String, HllRow, (String, Long, Array[Int])] {
    @transient private var regs: ValueState[Array[Int]] = _
    @transient private var upd: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      regs = getHandle.getValueState[Array[Int]](
        "regs", ExpressionEncoder[Array[Int]](), TTLConfig.NONE)
      upd = getHandle.getValueState[Long]("upd", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[HllRow],
        timerValues: TimerValues): Iterator[(String, Long, Array[Int])] = {
      val r = if (regs.exists()) regs.get() else new Array[Int](Sketches.HllM)
      rows.foreach(o => if (o.rho > r(o.bucket)) r(o.bucket) = o.rho)
      regs.update(r)
      val n = if (upd.exists()) upd.get() + 1L else 1L
      upd.update(n)
      Iterator.single((key, n, r.clone()))
    }
  }

  /** (g, bucket, rho) stream → running (g, update_seq, regs) sketches.
    * Requires the RocksDB state store provider (transformWithState). */
  def hllSketchStream(rows: Dataset[HllRow]): Dataset[(String, Long, Array[Int])] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.g)
      .transformWithState(new HllSketchProcessor, TimeMode.None(), OutputMode.Append())
  }

  /** One pre-binned histogram observation (see
    * [[graft.operators.Sketches.binOf]] — edges are fixed up front, the
    * streaming state only ever ADDS counts). */
  case class BinRow(g: String, bin: Int)

  /** Per-group fixed-width histogram registers: counts add across
    * micro-batches (the mergeable property [[graft.operators.Sketches
    * .histogramQuantiles]] exploits within one batch), snapshot emitted
    * per batch like [[HllSketchProcessor]]. */
  class HistSketchProcessor(bins: Int)
      extends StatefulProcessor[String, BinRow, (String, Long, Array[Long])] {
    @transient private var counts: ValueState[Array[Long]] = _
    @transient private var upd: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getValueState[Array[Long]](
        "counts", ExpressionEncoder[Array[Long]](), TTLConfig.NONE)
      upd = getHandle.getValueState[Long]("upd", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[BinRow],
        timerValues: TimerValues): Iterator[(String, Long, Array[Long])] = {
      val c = if (counts.exists()) counts.get() else new Array[Long](bins)
      rows.foreach(o => c(o.bin) += 1L)
      counts.update(c)
      val n = if (upd.exists()) upd.get() + 1L else 1L
      upd.update(n)
      Iterator.single((key, n, c.clone()))
    }
  }

  /** (g, bin) stream → running (g, update_seq, counts) histograms. */
  def histSketchStream(rows: Dataset[BinRow], bins: Int): Dataset[(String, Long, Array[Long])] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.g)
      .transformWithState(new HistSketchProcessor(bins), TimeMode.None(), OutputMode.Append())
  }
}
