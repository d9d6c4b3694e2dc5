package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental per-symbol feature derivation with explicit state — the
  * streaming twin of ops/Derive for the windowed columns, via
  * flatMapGroupsWithState (SURVEY §2.8: the reference re-derives everything
  * from scratch daily; this carries the trailing-20 close window as state
  * and emits features per incoming bar).
  *
  * State per symbol = the last 19 closes (newest first) — a few hundred
  * bytes; at 100 TB the state-store footprint is keys x 160 bytes, bounded
  * and independent of history length. Batch Datasets run through the same
  * function (Spark executes it as a single-batch group pass), so
  * batch/stream parity is testable directly.
  */
object StatefulFeatures {

  case class Bar(symbol: String, date: java.sql.Date, close: Double)
  case class SymbolState(recentDesc: List[Double])
  case class BarFeatures(symbol: String, date: java.sql.Date, close: Double,
                         daily_change: Option[Double], ma_5: Double, ma_20: Double)

  /** Fold one date-ordered batch of bars through the trailing-close state. */
  private def advance(symbol: String, bars: Iterator[Bar],
                      state: GroupState[SymbolState]): Iterator[BarFeatures] = {
    val sorted = bars.toSeq.sortBy(_.date.toString) // micro-batch arrival order is arbitrary
    var recent = state.getOption.map(_.recentDesc).getOrElse(Nil)
    val out = sorted.map { bar =>
      val change = recent.headOption.map(prev => bar.close - prev)
      val withNow = bar.close :: recent
      val f = BarFeatures(symbol, bar.date, bar.close, change,
        ma_5 = withNow.take(5).sum / math.min(withNow.length, 5),
        ma_20 = withNow.take(20).sum / math.min(withNow.length, 20))
      recent = withNow.take(19)
      f
    }
    state.update(SymbolState(recent))
    out.iterator
  }

  /** Works on both streaming and batch Datasets of bars. */
  def derive(spark: SparkSession, bars: Dataset[Bar]): Dataset[BarFeatures] = {
    import spark.implicits._
    bars.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(advance)
  }
}
