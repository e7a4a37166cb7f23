package graft.operators
import graft.Q
object GeoQueries {
  def all: Seq[Q] = Seq()
}
