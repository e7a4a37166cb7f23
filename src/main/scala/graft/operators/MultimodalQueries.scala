package graft.operators
import graft.Q
object MultimodalQueries {
  def all: Seq[Q] = Seq()
}
