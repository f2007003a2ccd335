package graft.kernel

/** Minimal dense matrix helpers for the optimal-pursuit kernel (4×4 /
  * 4×2 matrices, row-major `Array[Array[Double]]`). Local, driver-free
  * math used inside per-group kernels — never a column type
  * (SURVEY.md §1.2).
  */
object Linalg {
  type Mat = Array[Array[Double]]

  def zeros(r: Int, c: Int): Mat = Array.fill(r, c)(0.0)

  def diag(d: Double*): Mat = {
    val n = d.length
    val m = zeros(n, n)
    var i = 0
    while (i < n) { m(i)(i) = d(i); i += 1 }
    m
  }

  def matmul(a: Mat, b: Mat): Mat = {
    val (n, k, m) = (a.length, b.length, b(0).length)
    val out = zeros(n, m)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        var s = 0.0
        var p = 0
        while (p < k) { s += a(i)(p) * b(p)(j); p += 1 }
        out(i)(j) = s
        j += 1
      }
      i += 1
    }
    out
  }

  def matvec(a: Mat, v: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) {
      var s = 0.0
      var j = 0
      while (j < v.length) { s += a(i)(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  def transpose(a: Mat): Mat = {
    val out = zeros(a(0).length, a.length)
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a(0).length) { out(j)(i) = a(i)(j); j += 1 }
      i += 1
    }
    out
  }

  def add(a: Mat, b: Mat): Mat =
    a.zip(b).map { case (ra, rb) => ra.zip(rb).map { case (x, y) => x + y } }

  def sub(a: Mat, b: Mat): Mat =
    a.zip(b).map { case (ra, rb) => ra.zip(rb).map { case (x, y) => x - y } }

  def scale(a: Mat, k: Double): Mat = a.map(_.map(_ * k))

  def neg(a: Mat): Mat = scale(a, -1.0)

  /** Flatten row-major (numpy reshape(-1) order). */
  def flatten(a: Mat): Array[Double] = a.flatten

  def reshape(v: Array[Double], r: Int, c: Int): Mat =
    Array.tabulate(r, c)((i, j) => v(i * c + j))
}
