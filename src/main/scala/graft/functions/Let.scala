package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composed let-binding for array expressions.
  *
  * Spark's higher-order functions run interpreted with no
  * common-subexpression elimination, so a lambda body (or a
  * projection collapsed above a Generate) that references an
  * expensive array expression more than once re-evaluates it per
  * reference — in the worst case per element or per exploded row,
  * turning linear work quadratic or cubic (measured: the winnowing
  * fingerprint went 0.2s → 300s at sf0.1 without binding).
  *
  * `bindArray(expr)(f)` evaluates `expr` exactly once per row and
  * passes it to `f` as a BOUND lambda variable (transform over a
  * 1-element array); every reference inside `f` is then an O(1)
  * variable access. Nesting composes: bindArray(a) { x =>
  * bindArray(g(x)) { y => ... } }.
  */
object Let {
  def bindArray(arr: Column)(f: Column => Column): Column =
    element_at(transform(array(arr), f), 1)
}
