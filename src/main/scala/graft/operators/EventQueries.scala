package graft.operators
import graft.Q
object EventQueries {
  def all: Seq[Q] = Seq()
}
