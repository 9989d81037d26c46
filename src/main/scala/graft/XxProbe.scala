package graft
object XxProbe {
  def main(args: Array[String]): Unit = {
    val planes = graft.operators.Similarity.hyperplanes(16, 64)
    println("PLANES\t" + planes.map(_.mkString(",")).mkString(";"))
  }
}
