package graft.tools

/** Dev aid: print the OhdsiAchilles catalog as DuckDB VALUES rows (used to
  * regenerate the literal `achilles_analysis_catalog` oracle).
  */
object CatalogDump {
  def main(args: Array[String]): Unit = {
    val rows = graft.operators.OhdsiAchilles.Catalog.sortBy(_.id).map { a =>
      def s(x: String) = if (x.isEmpty) "NULL" else "'" + x + "'"
      s"  (${a.id}, '${a.name.replace("'", "''")}', ${s(a.stratum1)}, ${s(a.stratum2)}, " +
        s"${s(a.stratum3)}, ${s(a.stratum4)}, ${if (a.isDist) 1 else 0})"
    }
    println("=== N=" + rows.size)
    println(rows.mkString(",\n"))
  }
}
