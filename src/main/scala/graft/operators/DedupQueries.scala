package graft.operators
import graft.Q
object DedupQueries {
  def all: Seq[Q] = Seq()
}
