package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed statistics via sufficient-statistic aggregation —
  * the one-pass, map-side-combinable shape that scales: per group a
  * single aggregate collects exact sums, and the model parameters
  * are closed-form arithmetic over one tiny row per group. No
  * iteration, no per-group data movement beyond the partial sums.
  */
object Stats {

  /** Per-group simple linear regression (ordinary least squares) of
    * `yCol` on `xCol`, plus Pearson r²: returns one row per group
    * with `n`, `slope`, `intercept`, `r2`.
    *
    * Exactness contract (the q71 oracle hash-gates it): x and y are
    * cast to DECIMAL before summing, so the six sufficient sums
    * (n, Σx, Σy, Σx², Σxy, Σy²) are EXACT and order-independent —
    * the nondeterministic float-sum trap that makes naive
    * distributed regression unreproducible never opens. The
    * closed-form step then runs in doubles through correctly-rounded
    * IEEE ops only (casts, *, -, /), written in the same expression
    * shape on both engines, hence bit-identical results. Callers
    * should pre-center x (e.g. rebase epoch seconds to the corpus
    * era) so x² stays inside the declared decimal precision, and
    * note the decimal casts QUANTIZE the inputs: x to `xScale`
    * places (default 0 — integral predictors) and y to `yScale`
    * places, half-up. Pass wider scales for fractional inputs.
    *
    * Rows with a null x or y — including values that overflow the
    * declared decimal precision, which cast to null — are excluded
    * entirely: `n` and every sum cover exactly the observed (x, y)
    * pairs, the OLS
    * convention (counting nulls into n while null-skipping the sums
    * would silently skew every coefficient). Degenerate groups
    * (constant x, constant y, or a single row) yield null
    * slope/intercept/r² rather than ±Inf/NaN. */
  def linearFit(df: DataFrame, groupCols: Seq[String],
                xCol: Column, yCol: Column,
                xPrec: Int = 12, xScale: Int = 0,
                yPrec: Int = 18, yScale: Int = 2): DataFrame = {
    val gcols = groupCols.map(col)
    // try_cast + post-cast filter: a value that overflows
    // decimal(prec,scale) becomes null in BOTH ANSI and legacy modes
    // (a plain cast would throw under ANSI, null-out under legacy —
    // and the legacy null, filtered pre-cast, counted the row in n
    // while every sum null-skipped it: silently skewed
    // coefficients). Filtering on the cast values keeps n and the
    // sums over exactly the same rows; out-of-range pairs are
    // excluded like nulls, deterministically, in either mode.
    val x = xCol.try_cast(s"decimal($xPrec,$xScale)")
    val y = yCol.try_cast(s"decimal($yPrec,$yScale)")
    val agg = df.filter(x.isNotNull && y.isNotNull).groupBy(gcols: _*).agg(
      count(lit(1)).as("n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"), sum(x * y).as("__sxy"),
      sum(y * y).as("__syy"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double")
    val sxy = col("__sxy").cast("double")
    val syy = col("__syy").cast("double")
    val dx = n * sxx - sx * sx
    val dy = n * syy - sy * sy
    val cov = n * sxy - sx * sy
    val slope = when(dx =!= 0.0, cov / dx)
    agg
      .withColumn("slope", slope)
      .withColumn("intercept", when(dx =!= 0.0, (sy - slope * sx) / n))
      .withColumn("r2", when(dx =!= 0.0 && dy =!= 0.0, cov * cov / (dx * dy)))
      .drop("__sx", "__sy", "__sxx", "__sxy", "__syy")
  }
}
