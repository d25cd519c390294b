package graft.scale

/** Helpers for internal/temporary column naming. */
private[graft] object Cols {
  /** A temp column name derived from `base` that does not collide with any
    * name in `taken` (numeric suffixes until free), so operators that add
    * scratch columns never clobber same-named user columns. */
  def fresh(base: String, taken: Iterable[String]): String = {
    val t = taken.toSet
    if (!t(base)) base
    else Iterator.from(1).map(i => s"$base$i").find(n => !t(n)).get
  }
}
