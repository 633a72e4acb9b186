package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.operators.Micro.jvm6

/** Linear-time sequential recurrence over a date-sorted
  * `array<struct<…>>` — the recursive-indicator family's scan
  * (kama / heikin_ashi / supertrend / psar / fisher_transform), which
  * the HOF form (`aggregate(bs, array(), (acc, x) => concat(acc,
  * array(struct(…))))`) computes with an O(h²) copy constant: every
  * step re-copies the whole accumulator array, so a per-asset history
  * of h bars costs h²/2 struct copies (plus per-step interpreted
  * lambda evaluation — `aggregate` is CodegenFallback). Invisible at
  * h ≈ 4 000; the r9 depth-axis ScaleProbe measured the bend at
  * h ≈ 1 700 (kama 16×→64× history: ×4 data, ×8.9 time). This
  * expression runs the IDENTICAL recursion into a PRE-SIZED output
  * array — one allocation, h steps, O(h) — with each step's IEEE op
  * sequence copied verbatim from the HOF lambda (same association
  * order, [[graft.operators.Micro.jvm6]] as the bit-exact JVM twin of
  * the Column-side u6, `Math.min`/`max` for `least`/`greatest` on the
  * non-null non-NaN inputs these recursions produce), so results are
  * bit-for-bit what the HOF produced and every DuckDB recursive-CTE
  * oracle replays unchanged.
  *
  * Null contract mirrors the Column semantics of each lambda: a null
  * WHEN-condition falls to the otherwise branch (implemented as
  * null-is-false comparisons), null arithmetic inputs propagate to a
  * null state value, and a null recursive state poisons the rest of
  * that asset's series — observationally identical to the HOF.
  *
  * Input struct layouts are positional contracts with the call sites
  * (field names are not consulted):
  *   - `kama`         in (date, close, er, sc)        out (date, close, er, kama)
  *   - `mcginley`     in (date, close, kn)            out (date, close, md)
  *   - `laguerre`     in (date, close)                out (date, close, lrsi)
  *   - `super_smoother` in (date, close, c1, c2, c3)  out (date, close, ss)
  *   - `highpass2`    in (date, close, k0, c2, c3)    out (date, close, hp)
  *   - `zigzag`       in (date, close, th)            out (date, close, dir, ext, pivot, kind)
  *   - `kalman1d`     in (date, close, q, r)          out (date, close, level, gain)
  *   - `holt`         in (date, close, a, b)          out (date, close, level, trend, forecast)
  *   - `heikin_ashi`  in (date, open, high, low, close) out (date, high, low, ho, hc)
  *   - `supertrend`   in (date, close, bub, blb)      out (date, close, fub, flb, dir)
  *   - `psar`         in (date, high, low, close)     out (date, high, low, close, sar, ep, af, dir)
  *   - `fisher`       in (date, close, x)             out (date, close, v, fisher)
  *   - `renko`        in (date, close, m: long, size: long) out (date, close, n_bricks, cum_bricks, dir, anchor)
  *   - `garch`        in (date, ret)                  out (date, ret, sigma2, vol)
  *   - `cumprod1p`    in (date, x)                    out (date, x, acc)
  */
case class RecurrenceFold(child: Expression, op: String)
  extends UnaryExpression {

  require(RecurrenceFold.Ops.contains(op), s"unknown recurrence op: $op")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == RecurrenceFold.inArity(op) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"recurrence_$op expects array<struct[${RecurrenceFold.inArity(op)}]>, got $other")
    }

  override def dataType: DataType =
    ArrayType(RecurrenceFold.outSchema(op), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = s"recurrence_$op"

  // null-is-false comparisons: a null SQL WHEN-condition selects the
  // otherwise branch, which is exactly what these yield inside if/else
  private def lt(a: java.lang.Double, b: java.lang.Double): Boolean =
    a != null && b != null && a < b
  private def gt(a: java.lang.Double, b: java.lang.Double): Boolean =
    a != null && b != null && a > b
  private def d(r: org.apache.spark.sql.catalyst.InternalRow, i: Int): java.lang.Double =
    if (r.isNullAt(i)) null else r.getDouble(i)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    op match {
      case "kama" =>
        var prevK: java.lang.Double = null
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 4)
          val close = d(r, 1)
          val sc = d(r, 3)
          val k: java.lang.Double =
            if (i == 0) close
            else if (prevK == null || sc == null || close == null) null
            else jvm6(prevK + sc * (close - prevK))
          out(i) = new GenericInternalRow(Array[Any](r.getInt(0), close, d(r, 2), k))
          prevK = k
          i += 1
        }
      case "mcginley" =>
        // MD_t = MD + (p − MD)/(kn·(p/MD)⁴) — the smoothing factor
        // depends on the STATE itself (price above the line speeds the
        // chase, below slows it), so unlike vidya this cannot ride the
        // kama form with a precomputed sc. kn = k·n arrives per row
        // (field 2, constant per call). r⁴ is built by explicit
        // left-assoc multiplies — no libm pow — so the DuckDB
        // recursive CTE replays the identical IEEE sequence. A null
        // close (or a state poisoned by one) emits null state for the
        // rest of the series. The indicator is PRICE-domain: a
        // non-positive close or state nulls out (r⁴ would hit a
        // zero/negative divisor and the line diverges to ±inf on the
        // synthetic signed panel) — the guard keeps every emitted
        // value finite and both engines agree on the exact poison row.
        var prevMd: java.lang.Double = null
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 3)
          val close = d(r, 1)
          val kn = d(r, 2)
          val md: java.lang.Double =
            if (i == 0) close
            else if (prevMd == null || close == null || kn == null ||
                     prevMd <= 0.0 || close <= 0.0) null
            else {
              val ratio = close / prevMd
              jvm6(prevMd + (close - prevMd) / (kn * (((ratio * ratio) * ratio) * ratio)))
            }
          out(i) = new GenericInternalRow(Array[Any](r.getInt(0), close, md))
          prevMd = md
          i += 1
        }
      case "laguerre" =>
        // Ehlers' 4-stage Laguerre filter with γ = 0.5 (exact binary,
        // so every step is a fixed IEEE op sequence): the cascade
        // L0..L3 updates per bar, LRSI = CU/(CU+CD) over the three
        // stage gaps. Seed bar fills every stage with the close (all
        // gaps 0 → denominator 0 → null LRSI). Null close (or a state
        // poisoned by one) emits null state for the rest of the series.
        var p0: java.lang.Double = null; var p1: java.lang.Double = null
        var p2: java.lang.Double = null; var p3: java.lang.Double = null
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 2)
          val close = d(r, 1)
          var lrsi: java.lang.Double = null
          if (i == 0) {
            p0 = close; p1 = close; p2 = close; p3 = close
            // all gaps zero at the seed → denominator 0 → null
          } else if (close == null || p0 == null || p1 == null ||
                     p2 == null || p3 == null) {
            p0 = null; p1 = null; p2 = null; p3 = null
          } else {
            val l0 = jvm6(0.5 * close + 0.5 * p0)
            val l1 = jvm6(-0.5 * l0 + p0 + 0.5 * p1)
            val l2 = jvm6(-0.5 * l1 + p1 + 0.5 * p2)
            val l3 = jvm6(-0.5 * l2 + p2 + 0.5 * p3)
            val cu = math.max(l0 - l1, 0.0) + math.max(l1 - l2, 0.0) +
              math.max(l2 - l3, 0.0)
            val cd = math.max(l1 - l0, 0.0) + math.max(l2 - l1, 0.0) +
              math.max(l3 - l2, 0.0)
            lrsi = if (cu + cd == 0.0) null else jvm6(cu / (cu + cd))
            p0 = l0; p1 = l1; p2 = l2; p3 = l3
          }
          out(i) = new GenericInternalRow(Array[Any](r.getInt(0), close, lrsi))
          i += 1
        }
      case "super_smoother" =>
        // Ehlers' two-pole super smoother: ss = c1·(p + p₋₁)/2 +
        // c2·ss₋₁ + c3·ss₋₂, seeded ss₁ = p₁, ss₂ = p₂. The
        // coefficients arrive per row as u6-rounded doubles (computed
        // once driver-side — the single libm exp/cos calls never run
        // per-bar), so both engines multiply identical constants.
        var pClose: java.lang.Double = null
        var s1: java.lang.Double = null // ss_{t-1}
        var s2: java.lang.Double = null // ss_{t-2}
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 5)
          val close = d(r, 1)
          val c1 = d(r, 2); val c2 = d(r, 3); val c3 = d(r, 4)
          val ss: java.lang.Double =
            if (i <= 1) close
            else if (close == null || pClose == null || s1 == null || s2 == null ||
                     c1 == null || c2 == null || c3 == null) null
            else jvm6(c1 * ((close + pClose) / 2.0) + c2 * s1 + c3 * s2)
          out(i) = new GenericInternalRow(Array[Any](r.getInt(0), close, ss))
          pClose = close; s2 = s1; s1 = ss
          i += 1
        }
      case "highpass2" =>
        // Two-pole high-pass: hp = k0·(p − 2p₋₁ + p₋₂) + c2·hp₋₁ +
        // c3·hp₋₂, seeded hp₁ = hp₂ = 0 (the standard Ehlers seeding —
        // the filter settles within ~2 periods). Coefficients arrive
        // per row as u6-rounded driver constants. Input poly needs TWO
        // previous closes, so bars 1-2 emit the zero seed.
        var pc1: java.lang.Double = null // p_{t-1}
        var pc2: java.lang.Double = null // p_{t-2}
        var h1: java.lang.Double = null
        var h2: java.lang.Double = null
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 5)
          val close = d(r, 1)
          val k0 = d(r, 2); val c2 = d(r, 3); val c3 = d(r, 4)
          val hp: java.lang.Double =
            if (i <= 1) 0.0
            else if (close == null || pc1 == null || pc2 == null ||
                     h1 == null || h2 == null ||
                     k0 == null || c2 == null || c3 == null) null
            else jvm6(k0 * ((close - 2.0 * pc1) + pc2) + c2 * h1 + c3 * h2)
          out(i) = new GenericInternalRow(Array[Any](r.getInt(0), close, hp))
          pc2 = pc1; pc1 = close; h2 = h1; h1 = hp
          i += 1
        }
      case "zigzag" =>
        // Threshold-reversal pivots: while trending up the running
        // extreme ratchets with new highs; a close at or below
        // ext·(1−th) CONFIRMS the extreme as a swing HIGH and flips
        // the leg (mirrored for downtrends). Before the first
        // reversal (dir 0) both extremes are tracked and the first
        // threshold breach picks the initial leg. All comparisons are
        // raw IEEE products of u6-grid closes with the exact decimal
        // 1±th — identical verdicts cross-engine. Contract:
        // positive closes, non-null (the LWW daily panel).
        var dir = 0L
        var hi = 0.0; var lo = 0.0
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 3)
          val close = r.getDouble(1)
          val th = r.getDouble(2)
          var pivot: java.lang.Double = null
          var kind = 0L
          if (i == 0) { hi = close; lo = close }
          else if (dir == 0L) {
            if (close >= lo * (1.0 + th)) {
              pivot = lo; kind = -1L; dir = 1L; hi = close
            } else if (close <= hi * (1.0 - th)) {
              pivot = hi; kind = 1L; dir = -1L; lo = close
            } else {
              if (close > hi) hi = close
              if (close < lo) lo = close
            }
          } else if (dir == 1L) {
            if (close > hi) hi = close
            else if (close <= hi * (1.0 - th)) {
              pivot = hi; kind = 1L; dir = -1L; lo = close
            }
          } else {
            if (close < lo) lo = close
            else if (close >= lo * (1.0 + th)) {
              pivot = lo; kind = -1L; dir = 1L; hi = close
            }
          }
          val ext = if (dir == -1L) lo else hi
          out(i) = new GenericInternalRow(
            Array[Any](r.getInt(0), close, dir, ext, pivot, kind))
          i += 1
        }
      case "kalman1d" =>
        // 1-D local-level Kalman filter: predict P += Q, gain
        // K = P/(P+R), correct level += K·(p − level), P = (1−K)·P.
        // The gain SELF-TUNES from the covariance recursion (converges
        // toward the steady-state Riccati gain) — unlike a fixed-α
        // EMA. u6 at gain/level/covariance each step keeps both
        // engines on the identical doubles. Seed: level = p, P = 1.
        var lvl: java.lang.Double = null
        var p: java.lang.Double = null
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 4)
          val close = d(r, 1)
          val q = d(r, 2); val rr = d(r, 3)
          var gain: java.lang.Double = null
          if (i == 0) { lvl = close; p = 1.0 }
          else if (close == null || lvl == null || p == null || q == null || rr == null) {
            lvl = null; p = null
          } else {
            val pp = p + q
            gain = jvm6(pp / (pp + rr))
            lvl = jvm6(lvl + gain * (close - lvl))
            p = jvm6((1.0 - gain) * pp)
          }
          out(i) = new GenericInternalRow(Array[Any](r.getInt(0), close, lvl, gain))
          i += 1
        }
      case "holt" =>
        // Holt's linear (double-exponential) smoothing: level tracks
        // the series, trend tracks the level's drift, forecast = level
        // + trend — the one-step-ahead forecasting primitive. Seeds:
        // level = p₁, trend = 0.
        var lvl: java.lang.Double = null
        var tr: java.lang.Double = null
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 4)
          val close = d(r, 1)
          val a = d(r, 2); val b = d(r, 3)
          if (i == 0) { lvl = close; tr = 0.0 }
          else if (close == null || lvl == null || tr == null || a == null || b == null) {
            lvl = null; tr = null
          } else {
            val lNew = jvm6(a * close + (1.0 - a) * (lvl + tr))
            tr = jvm6(b * (lNew - lvl) + (1.0 - b) * tr)
            lvl = lNew
          }
          val fc: java.lang.Double =
            if (lvl == null || tr == null) null else jvm6(lvl + tr)
          out(i) = new GenericInternalRow(
            Array[Any](r.getInt(0), close, lvl, tr, fc))
          i += 1
        }
      case "heikin_ashi" =>
        var prevHo: java.lang.Double = null
        var prevHc: java.lang.Double = null
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 5)
          val open = d(r, 1); val high = d(r, 2); val low = d(r, 3); val close = d(r, 4)
          val hc: java.lang.Double =
            if (open == null || high == null || low == null || close == null) null
            else jvm6((open + high + low + close) / 4.0)
          val ho: java.lang.Double =
            if (i == 0) { if (open == null || close == null) null else jvm6((open + close) / 2.0) }
            else if (prevHo == null || prevHc == null) null
            else jvm6((prevHo + prevHc) / 2.0)
          out(i) = new GenericInternalRow(Array[Any](r.getInt(0), high, low, ho, hc))
          prevHo = ho; prevHc = hc
          i += 1
        }
      case "supertrend" =>
        var pClose: java.lang.Double = null
        var pFub: java.lang.Double = null
        var pFlb: java.lang.Double = null
        var pDir = 1L
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 4)
          val close = d(r, 1); val bub = d(r, 2); val blb = d(r, 3)
          val fub: java.lang.Double =
            if (i == 0) bub
            else if (lt(bub, pFub) || gt(pClose, pFub)) bub else pFub
          val flb: java.lang.Double =
            if (i == 0) blb
            else if (gt(blb, pFlb) || lt(pClose, pFlb)) blb else pFlb
          val dir: Long =
            if (i == 0) 1L
            else if (pDir == 1L) { if (lt(close, flb)) -1L else 1L }
            else { if (gt(close, fub)) 1L else -1L }
          out(i) = new GenericInternalRow(Array[Any](r.getInt(0), close, fub, flb, dir))
          pClose = close; pFub = fub; pFlb = flb; pDir = dir
          i += 1
        }
      case "psar" =>
        // state p = previous OUT row (carries the previous bar's
        // high/low/close alongside sar/ep/af/dir)
        var pHigh: java.lang.Double = null; var pLow: java.lang.Double = null
        var pClose: java.lang.Double = null
        var pSar: java.lang.Double = null; var pEp: java.lang.Double = null
        var pAf: java.lang.Double = null; var pDir = 0L
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 4)
          val high = d(r, 1); val low = d(r, 2); val close = d(r, 3)
          var sar: java.lang.Double = null; var ep: java.lang.Double = null
          var af: java.lang.Double = null; var dir = 0L
          // Null guard mirroring the replaced HOF's null propagation: a
          // null high/low (or a state poisoned by one) emits a null
          // state row for the rest of the series instead of NPE-ing the
          // task on auto-unboxing into math.min/max and arithmetic.
          // dir stays 0 (the seed-row convention — the field is
          // non-nullable) and the pSar==null guard below keeps it from
          // ever being consulted.
          if (i == 1 && high != null && low != null && pHigh != null && pLow != null) {
            // init from the seed bar: null close comparison (impossible
            // from dailyBars) falls to the down-trend branch like SQL
            val upInit = close != null && pClose != null && close >= pClose
            if (upInit) {
              sar = math.min(pLow, low); ep = math.max(pHigh, high); dir = 1L
            } else {
              sar = math.max(pHigh, high); ep = math.min(pLow, low); dir = -1L
            }
            af = 0.02
          } else if (i >= 2 && pSar != null && pAf != null && pEp != null &&
                     pHigh != null && pLow != null && high != null && low != null) {
            val sarRaw = jvm6(pSar + pAf * (pEp - pSar))
            val sarClamped =
              if (pDir == 1L) math.min(sarRaw, pLow) else math.max(sarRaw, pHigh)
            val flipped =
              if (pDir == 1L) lt(low, sarClamped) else gt(high, sarClamped)
            sar = if (flipped) pEp else sarClamped
            ep =
              if (flipped) { if (pDir == 1L) low else high }
              else { if (pDir == 1L) math.max(pEp, high) else math.min(pEp, low) }
            af =
              if (flipped) 0.02
              else if ((pDir == 1L && gt(high, pEp)) || (pDir == -1L && lt(low, pEp)))
                math.min(jvm6(pAf + 0.02), 0.2)
              else pAf
            dir = if (flipped) -pDir else pDir
          } // i == 0 or null-poisoned: all-null state, dir 0
          out(i) = new GenericInternalRow(
            Array[Any](r.getInt(0), high, low, close, sar, ep, af, dir))
          pHigh = high; pLow = low; pClose = close
          pSar = sar; pEp = ep; pAf = af; pDir = dir
          i += 1
        }
      case "fisher" =>
        var pv = 0.0
        var pf = 0.0
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 3)
          val x = r.getDouble(2) // clamped to ±0.999 upstream, never null
          val v = jvm6(0.33 * x + 0.67 * pv)
          val fisher = jvm6(0.5 * math.log((1.0 + v) / (1.0 - v)) + 0.5 * pf)
          out(i) = new GenericInternalRow(Array[Any](r.getInt(0), d(r, 1), v, fisher))
          pv = v; pf = fisher
          i += 1
        }
      case "renko" =>
        // Fixed-brick renko over MICRO-integer closes: ALL state is
        // integral (anchor/size in 1e-6 units), so there is no float
        // op anywhere in the recursion — the DuckDB CTE replays it
        // with BIGINT arithmetic bit-for-bit. Convention (documented,
        // both engines): continuation threshold 1 brick, reversal
        // threshold 2 bricks, and a move of k full bricks prints k
        // bricks from the CURRENT anchor (no 2-brick reversal
        // discount). A null close passes through as a zero-brick row
        // with state unchanged (the panel's closes are non-null; the
        // guard keeps a poisoned tick from NPE-ing the series — the
        // r9 ADVICE lesson from psar). The anchor seeds from the FIRST
        // NON-NULL close (a leading null emits a null anchor, it does
        // not read the struct's integral field — which would be an
        // undefined 0 — into the state).
        var anchor = 0L
        var dir = 0L
        var cum = 0L
        var seeded = false
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 4)
          val close = d(r, 1)
          if (close == null) {
            val a: Any = if (seeded) anchor / 1e6 else null
            out(i) = new GenericInternalRow(
              Array[Any](r.getInt(0), close, 0L, cum, dir, a))
          } else if (!seeded) {
            anchor = r.getLong(2); dir = 0L; cum = 0L; seeded = true
            out(i) = new GenericInternalRow(
              Array[Any](r.getInt(0), close, 0L, 0L, 0L, anchor / 1e6))
          } else {
            val m = r.getLong(2); val size = r.getLong(3)
            val upThr = if (dir == -1L) 2L * size else size
            val dnThr = if (dir == 1L) 2L * size else size
            var delta = 0L
            if (m >= anchor + upThr) {
              val k = (m - anchor) / size
              anchor += k * size; dir = 1L; delta = k
            } else if (m <= anchor - dnThr) {
              val k = (anchor - m) / size
              anchor -= k * size; dir = -1L; delta = -k
            }
            cum += delta
            out(i) = new GenericInternalRow(
              Array[Any](r.getInt(0), close, delta, cum, dir, anchor / 1e6))
          }
          i += 1
        }
      case "cumprod1p" =>
        // Running NAV compounding: acc ← u6(acc·(1+x)) per step, acc₀=1.
        // The per-asset prefix-product [[graft.expressions.SeqFold]]'s
        // one-shot `prod1p` can't emit without collecting an O(h²)
        // prefix array per row — this is the linear-time form.
        var acc: java.lang.Double = 1.0
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 2)
          val x = d(r, 1)
          acc = if (acc == null || x == null) null else jvm6(acc * (1.0 + x))
          out(i) = new GenericInternalRow(Array[Any](r.getInt(0), x, acc))
          i += 1
        }
      case "garch" =>
        // GARCH(1,1) variance FILTER with fixed textbook parameters
        // ω=1e-6, α=0.05, β=0.90 (estimation is MLE and out of scope;
        // the filter is what a risk engine runs online): σ²_t = ω +
        // α·r²_{t-1} + β·σ²_{t-1}, seeded with the CONSTANT σ²₁ =
        // 2e-5 (≈ the 0.45%-daily-vol unconditional variance ω/(1−α−β)
        // written as an exact literal) — a CAUSAL seed, so the O(1)
        // streaming twin reproduces the batch series bit-for-bit from
        // its first arrival. jvm12 per step — σ² lives near 1e-4 where
        // the u6 grid is blind. vol = √σ²: sqrt is correctly rounded
        // in IEEE 754, so both engines see the same double.
        var s: java.lang.Double = null
        var prevRet: java.lang.Double = null
        var i = 0
        while (i < n) {
          val r = arr.getStruct(i, 2)
          val ret = d(r, 1)
          if (i == 0) s = 2.0e-5
          else if (s == null || prevRet == null) s = null
          else s = graft.operators.Micro.jvm12(
            1.0e-6 + 0.05 * prevRet * prevRet + 0.90 * s)
          val vol: java.lang.Double =
            if (s == null) null else jvm6(math.sqrt(s))
          out(i) = new GenericInternalRow(Array[Any](r.getInt(0), ret, s, vol))
          prevRet = ret
          i += 1
        }
    }
    new GenericArrayData(out)
  }

  /** Reference-call codegen (the [[graft.expressions.MaxCharRun]] hash-kernel
    * pattern): the scan itself is a per-GROUP O(h) call whose cost
    * interpretation doesn't change, but emitting it as one compiled
    * call keeps the SURROUNDING projection inside whole-stage codegen
    * instead of demoting the whole stage to interpreted eval.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("recurrenceExpr", this, classOf[RecurrenceFold].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RecurrenceFold {
  val Ops: Set[String] = Set("kama", "mcginley", "laguerre", "super_smoother",
    "highpass2", "zigzag", "kalman1d", "holt",
    "heikin_ashi", "supertrend", "psar", "fisher", "renko", "garch",
    "cumprod1p")

  def inArity(op: String): Int = op match {
    case "kama" => 4
    case "mcginley" => 3
    case "laguerre" => 2
    case "super_smoother" => 5
    case "highpass2" => 5
    case "zigzag" => 3
    case "kalman1d" => 4
    case "holt" => 4
    case "heikin_ashi" => 5
    case "supertrend" => 4
    case "psar" => 4
    case "fisher" => 3
    case "renko" => 4
    case "garch" => 2
    case "cumprod1p" => 2
  }

  def outSchema(op: String): StructType = op match {
    case "kama" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("close", DoubleType), StructField("er", DoubleType),
      StructField("kama", DoubleType)))
    case "mcginley" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("close", DoubleType), StructField("md", DoubleType)))
    case "laguerre" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("close", DoubleType), StructField("lrsi", DoubleType)))
    case "super_smoother" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("close", DoubleType), StructField("ss", DoubleType)))
    case "highpass2" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("close", DoubleType), StructField("hp", DoubleType)))
    case "kalman1d" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("close", DoubleType), StructField("level", DoubleType),
      StructField("gain", DoubleType)))
    case "holt" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("close", DoubleType), StructField("level", DoubleType),
      StructField("trend", DoubleType), StructField("forecast", DoubleType)))
    case "zigzag" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("close", DoubleType),
      StructField("dir", LongType, nullable = false),
      StructField("ext", DoubleType),
      StructField("pivot", DoubleType),
      StructField("kind", LongType, nullable = false)))
    case "heikin_ashi" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("high", DoubleType), StructField("low", DoubleType),
      StructField("ho", DoubleType), StructField("hc", DoubleType)))
    case "supertrend" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("close", DoubleType), StructField("fub", DoubleType),
      StructField("flb", DoubleType), StructField("dir", LongType, nullable = false)))
    case "psar" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("high", DoubleType), StructField("low", DoubleType),
      StructField("close", DoubleType), StructField("sar", DoubleType),
      StructField("ep", DoubleType), StructField("af", DoubleType),
      StructField("dir", LongType, nullable = false)))
    case "fisher" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("close", DoubleType), StructField("v", DoubleType),
      StructField("fisher", DoubleType)))
    case "renko" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("close", DoubleType),
      StructField("n_bricks", LongType, nullable = false),
      StructField("cum_bricks", LongType, nullable = false),
      StructField("dir", LongType, nullable = false),
      // nullable: rows before the first non-null close have no anchor
      StructField("anchor", DoubleType)))
    case "garch" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("ret", DoubleType), StructField("sigma2", DoubleType),
      StructField("vol", DoubleType)))
    case "cumprod1p" => StructType(Seq(
      StructField("date", DateType, nullable = false),
      StructField("x", DoubleType), StructField("acc", DoubleType)))
  }
}
