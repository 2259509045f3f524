package graft.tools

/** Pure-JVM SVG plot emission — the reference ships matplotlib rooflines
  * and sweep comparisons (plotting_util.py:27-75, plot_stats.py:40-70);
  * this emits the same figures as dependency-free SVG so the artifacts
  * exist in a JVM-only deployment.
  *
  * Geometry mirrors `generate_roofline`: the queueing ramp X = N/R up to
  * Nstar and flat beyond it; dashed horizontal LP compute bound (and
  * disk bound when present); per-node rate hlines; vertical markers at
  * the measured N and at Nstar.
  */
object Plots {

  private val W = 720; private val H = 440
  private val L = 80; private val R = 20; private val T = 40; private val B = 60
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private final class Canvas(title: String, xLabel: String, yLabel: String,
      xMax: Double, yMax: Double) {
    private val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H">"""
    sb ++= s"""<rect width="$W" height="$H" fill="white"/>"""
    sb ++= s"""<text x="${W / 2}" y="22" text-anchor="middle" font-size="15" font-family="sans-serif">${esc(title)}</text>"""
    sb ++= s"""<text x="${W / 2}" y="${H - 12}" text-anchor="middle" font-size="12" font-family="sans-serif">${esc(xLabel)}</text>"""
    sb ++= s"""<text x="18" y="${H / 2}" text-anchor="middle" font-size="12" font-family="sans-serif" transform="rotate(-90 18 ${H / 2})">${esc(yLabel)}</text>"""
    // axes
    sb ++= s"""<line x1="$L" y1="${H - B}" x2="${W - R}" y2="${H - B}" stroke="black"/>"""
    sb ++= s"""<line x1="$L" y1="$T" x2="$L" y2="${H - B}" stroke="black"/>"""
    // y ticks
    (0 to 4).foreach { i =>
      val v = yMax * i / 4
      val y = sy(v)
      sb ++= s"""<line x1="${L - 4}" y1="$y" x2="$L" y2="$y" stroke="black"/>"""
      sb ++= s"""<text x="${L - 8}" y="${y + 4}" text-anchor="end" font-size="10" font-family="sans-serif">${fmt(v)}</text>"""
    }
    (0 to 4).foreach { i =>
      val v = xMax * i / 4
      val x = sx(v)
      sb ++= s"""<line x1="$x" y1="${H - B}" x2="$x" y2="${H - B + 4}" stroke="black"/>"""
      sb ++= s"""<text x="$x" y="${H - B + 16}" text-anchor="middle" font-size="10" font-family="sans-serif">${fmt(v)}</text>"""
    }

    def sx(v: Double): Double = L + (W - L - R) * (v / math.max(xMax, 1e-12))
    def sy(v: Double): Double = (H - B) - (H - T - B) * (v / math.max(yMax, 1e-12))
    private def fmt(v: Double): String =
      if (v >= 1e6) f"${v / 1e6}%.1fM" else if (v >= 1e3) f"${v / 1e3}%.1fk"
      else if (v == v.floor && v.abs < 1e4) v.toLong.toString else f"$v%.2f"

    def polyline(pts: Seq[(Double, Double)], color: String, dash: String = ""): Unit = {
      val d = if (dash.nonEmpty) s""" stroke-dasharray="$dash"""" else ""
      val p = pts.map { case (x, y) => s"${sx(x)},${sy(y)}" }.mkString(" ")
      sb ++= s"""<polyline points="$p" fill="none" stroke="$color"$d/>"""
    }
    def hline(y: Double, color: String, dash: String, label: String): Unit = {
      polyline(Seq((0.0, y), (xMax, y)), color, dash)
      sb ++= s"""<text x="${W - R - 4}" y="${sy(y) - 3}" text-anchor="end" font-size="10" fill="$color" font-family="sans-serif">${esc(label)}</text>"""
    }
    def vline(x: Double, yTop: Double, color: String, dash: String, label: String): Unit = {
      polyline(Seq((x, 0.0), (x, yTop)), color, dash)
      sb ++= s"""<text x="${sx(x) + 3}" y="${T + 12}" font-size="10" fill="$color" font-family="sans-serif">${esc(label)}</text>"""
    }
    def star(x: Double, y: Double, color: String): Unit =
      sb ++= s"""<circle cx="${sx(x)}" cy="${sy(y)}" r="4" fill="$color"/>"""
    def bar(x0: Double, x1: Double, y: Double, color: String, label: String, value: String): Unit = {
      val (px0, px1) = (sx(x0), sx(x1))
      sb ++= s"""<rect x="$px0" y="${sy(y)}" width="${px1 - px0}" height="${(H - B) - sy(y)}" fill="$color" fill-opacity="0.75"/>"""
      val cx = (px0 + px1) / 2
      sb ++= s"""<text x="$cx" y="${sy(y) - 4}" text-anchor="middle" font-size="10" font-family="sans-serif">${esc(value)}</text>"""
      sb ++= s"""<text x="$cx" y="${H - B + 30}" text-anchor="middle" font-size="10" font-family="sans-serif">${esc(label)}</text>"""
    }
    def save(path: String): Unit = {
      sb ++= "</svg>"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
    }
  }

  private val palette = Seq("#c0392b", "#d35400", "#f39c12", "#27ae60",
    "#16a085", "#2980b9", "#8e44ad", "#2c3e50")

  /** Roofline (plotting_util.generate_roofline parity): throughput vs
    * jobs-in-system, with LP compute bound, optional disk bound, and
    * per-node max rates. All rates in elements/second; `secPerElement`
    * is the roofline R converted to seconds.
    */
  def rooflineSvg(path: String, nJobs: Double, secPerElement: Double,
      nStar: Double, cpuBound: Double, diskBound: Option[Double] = None,
      nodeRates: Seq[(Double, String)] = Nil): Unit = {
    val r = math.max(secPerElement, 1e-12)
    val maxN = math.max(nStar * 2, nJobs + 1)
    val yCap = math.max(2 * cpuBound, nStar / r * 1.2)
    val shown = nodeRates.filter(_._1 < yCap)
    val c = new Canvas("roofline: X vs jobs in system", "N (jobs in system)",
      "X (elements/second)", maxN, yCap)
    // queueing ramp then plateau
    c.polyline(Seq((0.0, 0.0), (nStar, nStar / r), (maxN, nStar / r)), "black")
    c.hline(cpuBound, "black", "6,3", f"LP compute bound (${cpuBound}%.0f)")
    diskBound.foreach(dbb => c.hline(dbb, "black", "3,3,1,3", f"disk bound (${dbb}%.0f)"))
    shown.zipWithIndex.foreach { case ((rate, name), i) =>
      c.hline(rate, palette(i % palette.size), "4,4", name)
    }
    val bound = math.min(nJobs / r, cpuBound)
    c.vline(nJobs, bound, "#2980b9", "5,5", f"N=${nJobs}%.2f")
    c.star(nJobs, bound, "#2980b9")
    c.vline(nStar, nStar / r, "black", "1,3", f"N*=${nStar}%.2f")
    c.star(nStar, nStar / r, "black")
    c.save(path)
  }

  /** Arm-comparison bars (plot_stats.py's per-arm rate figure). */
  def barsSvg(path: String, bars: Seq[(String, Double)],
      title: String = "sweep arms", yLabel: String = "elements/second"): Unit = {
    require(bars.nonEmpty, "no bars to plot")
    val yMax = bars.map(_._2).max * 1.15
    val c = new Canvas(title, "", yLabel, bars.size.toDouble, yMax)
    bars.zipWithIndex.foreach { case ((name, v), i) =>
      c.bar(i + 0.15, i + 0.85, v, palette(i % palette.size), name, f"$v%.0f")
    }
    c.save(path)
  }
}
