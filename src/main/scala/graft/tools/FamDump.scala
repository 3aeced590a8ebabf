package graft.tools
object FamDump {
  def main(args: Array[String]): Unit = {
    graft.SparkEntry.families.toSeq.sortBy(_._1).foreach { case (q, f) => println(s"FAM $q $f") }
  }
}
