package graft.operators
import graft.Q
object SimilarityQueries {
  def all: Seq[Q] = Seq()
}
