package graft.operators
import graft.Q
object TextQueries {
  def all: Seq[Q] = Seq()
}
