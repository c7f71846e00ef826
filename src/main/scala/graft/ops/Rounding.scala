package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine-portable rounding recipe shared by every oracle-checked
  * float output: `floor(x·10⁴ + ½)/10⁴` emulates Spark's HALF_UP
  * `round(x, 4)` in a form every engine (including the DuckDB oracle)
  * reproduces bit-for-bit — engines disagree on round-half ties of a
  * composite double, while floor of the identical IEEE value is
  * portable. One definition so the parity recipe lives in one place. */
private[graft] object Rounding {
  def halfUp(c: Column, decimals: Int): Column = {
    val m = math.pow(10.0, decimals) // exact for the small scales used here
    floor(c * m + lit(0.5)) / m
  }
  def halfUp4(c: Column): Column = halfUp(c, 4)
}
