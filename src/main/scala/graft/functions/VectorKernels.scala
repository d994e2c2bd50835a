package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** JVM kernels behind the vector expressions ([[DotArrays]],
  * [[CosineSim]]) — called directly from generated code, so they must
  * stay static-forwardable (plain object methods, no overloads).
  *
  * Numeric contract: accumulation is a sequential left fold in element
  * order, bit-identical to `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * and to DuckDB's `list_reduce(list_prepend(0.0, ...))` twins the
  * oracle uses — swapping in these kernels cannot change a hash-checked
  * result. Null contract matches the fold form too: a null array, a
  * null element, or mismatched lengths → null.
  */
object VectorKernels {

  /** Sequential dot product of two DOUBLE arrays; null on mismatched
    * lengths or null elements (boxed so codegen can branch on it).
    */
  def dotBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    var s = 0.0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Cosine similarity in ONE pass (dot, |a|², |b|² accumulated
    * together) — the Column-level fold form walks both arrays three
    * times and allocates a lambda frame per element; this is the hot
    * path for every embedding query at 100 TB.
    */
  def cosineBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
