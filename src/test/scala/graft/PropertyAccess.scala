package graft.operators

/** Test bridge into `private[operators]` kernels for PropertySpec,
  * which lives in the parent `graft` package. */
object PropertyAccess {
  def positionalNgrams(text: String, n: Int): Array[(Int, String)] =
    Dedup.positionalNgrams(text, n)
}
