package graft.server

import scala.collection.mutable

/** Counter + ring-buffer statistics with reset-on-snapshot semantics
  * (reference: qcache/statistics.py). Counters accumulate; append/extend
  * feed fixed-size ring buffers; `snapshot()` returns everything plus
  * `statistics_duration` and resets. */
final class Statistics(bufferSize: Int,
                       clock: () => Long = () => System.currentTimeMillis()) {
  private val lock = new Object
  private var counters = mutable.LinkedHashMap.empty[String, Long]
  private var buffers = mutable.LinkedHashMap.empty[String, mutable.ArrayDeque[Double]]
  private var since: Long = clock()

  def inc(name: String, count: Long = 1): Unit = lock.synchronized {
    counters(name) = counters.getOrElse(name, 0L) + count
  }

  def append(name: String, value: Double): Unit = lock.synchronized {
    val buf = buffers.getOrElseUpdate(name, mutable.ArrayDeque.empty)
    buf.append(value)
    while (buf.length > bufferSize) buf.removeHead()
  }

  def extend(name: String, values: Seq[Double]): Unit = values.foreach(append(name, _))

  /** Snapshot resets all state (reference: statistics.py:33-48). */
  def snapshot(): Map[String, Any] = lock.synchronized {
    val now = clock()
    val result = mutable.LinkedHashMap.empty[String, Any]
    result("statistics_buffer_size") = bufferSize.toLong
    counters.foreach { case (k, v) => result(k) = v }
    buffers.foreach { case (k, v) => result(k) = v.toList }
    result("statistics_duration") = (now - since) / 1000.0
    counters = mutable.LinkedHashMap.empty
    buffers = mutable.LinkedHashMap.empty
    since = now
    result.toMap
  }
}
