package graft.core

/** Interval coalescing shared by the maintenance and streaming paths —
  * one implementation of the sort-then-fold merge so its edge cases
  * (duplicates, containment, adjacency) are fixed in one place.
  */
object Ranges {

  /** Merge overlapping ranges, and ranges whose gap is < `adjacency`
    * (adjacency 1 merges touching-or-adjacent ranges like [0,9]+[10,19]).
    * Input order and duplicates don't matter. */
  def merge(ranges: Seq[(Long, Long)], adjacency: Long = 1L): Seq[(Long, Long)] =
    ranges.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
      case ((s0, e0) :: tail, (s, e)) if s <= e0 + adjacency =>
        (s0, math.max(e0, e)) :: tail
      case (acc, r) => r :: acc
    }.reverse

  /** Contiguous runs of a slot list: [5,6,6,7,100] → [(5,7),(100,100)]. */
  def runsOf(slots: Seq[Long]): Seq[(Long, Long)] =
    merge(slots.map(s => (s, s)))
}
