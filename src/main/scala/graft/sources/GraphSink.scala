package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-database load generator — the Spark-native analog of the
  * reference's batched Neo4j insert path (utils/databases.py:185-337:
  * per-500-row `UNWIND $batch AS row CREATE (:Label {...})` node and
  * relationship statements driven over a bolt session;
  * :342-416 insert_sem_general_neo4j with `create_index(label, prop)`
  * per label; neo4j/queries/create_collaboration_graph.cql:3 `MERGE`
  * for re-runnable edges).
  *
  * The reference runs one driver-side pandas loop pushing 500-row
  * parameter batches through a socket — single-node by construction. The
  * Spark-native shape splits the work at the right boundary instead:
  *
  *   - statement TEXT is generated once per table (the same UNWIND
  *     template the reference embeds, with MERGE so re-runs match
  *     instead of double-inserting like the reference's bare CREATE;
  *     node/edge properties SET from payload columns, so replaying an
  *     applied batch is a no-op — the cql ON CREATE/ON MATCH counter
  *     idiom stays available separately for exactly-once transports);
  *   - batch PAYLOADS are written by the cluster as bounded JSONL files
  *     (`maxRecordsPerFile` — every executor writes its own batches, no
  *     driver loop, no collect) under `<out>/<table>/`;
  *   - the bolt TRANSPORT is the declared swap-in (the ApiEnrich stub
  *     discipline — zero-egress container): [[applyLoad]] walks
  *     manifest order and hands (statement, payload lines) to a caller
  *     transport, which in production is a neo4j-driver session and in
  *     specs a recorder.
  *
  * At 100 TB the payload write is a parallel scan-speed export; the
  * serial bolt session is the graph DB's own ingest bottleneck, not
  * Spark's — exactly where the reference pipeline sits, minus the
  * single-node batch generation.
  */
object GraphSink {

  /** Cypher ident guard: labels/keys/columns come from trusted code, but
    * fail loud on anything that would need quoting.
    */
  private def ident(s: String): String = {
    require(s.matches("[A-Za-z_][A-Za-z0-9_]*"), s"unsafe cypher ident: $s")
    s
  }

  /** `UNWIND $batch AS row MERGE (:Label {key: row.key}) SET n.p = row.p`
    * — idempotent node load (re-running a batch is a no-op on matched
    * keys, the upsertParquet contract at the graph tier).
    */
  def nodeMergeStatement(label: String, key: String,
      props: Seq[String]): String = {
    val sets =
      if (props.isEmpty) ""
      else props.map(p => s"n.${ident(p)} = row.${ident(p)}")
        .mkString("\nSET ", ", ", "")
    s"UNWIND $$batch AS row\n" +
      s"MERGE (n:${ident(label)} {${ident(key)}: row.${ident(key)}})$sets"
  }

  /** Relationship MERGE between two keyed nodes, edge properties SET
    * from payload columns — the replay-IDEMPOTENT form (a re-run of an
    * already-applied batch re-sets the same values, a no-op): Spark has
    * already aggregated the edge measures (collab_pairs carries its
    * exact collab_count), so the load sets them instead of re-counting
    * edge-by-edge like the reference.
    */
  def edgeMergeStatement(srcLabel: String, srcKey: String, dstLabel: String,
      dstKey: String, relType: String, srcCol: String, dstCol: String,
      props: Seq[String] = Nil): String = {
    val sets =
      if (props.isEmpty) ""
      else props.map(p => s"r.${ident(p)} = row.${ident(p)}")
        .mkString("\nSET ", ", ", "")
    s"UNWIND $$batch AS row\n" +
      s"MATCH (a:${ident(srcLabel)} {${ident(srcKey)}: row.${ident(srcCol)}})\n" +
      s"MATCH (b:${ident(dstLabel)} {${ident(dstKey)}: row.${ident(dstCol)}})\n" +
      s"MERGE (a)-[r:${ident(relType)}]->(b)$sets"
  }

  /** The reference's ON CREATE / ON MATCH counter idiom
    * (create_collaboration_graph.cql:3-5) parameterized — counts edge
    * occurrences server-side as batches stream in. NOT replay-idempotent
    * by construction (a replayed batch increments again): use it only
    * when the payload carries raw occurrences and the transport is
    * exactly-once; [[edgeMergeStatement]] with a pre-aggregated count
    * property is the retry-safe default.
    */
  def edgeCountingStatement(srcLabel: String, srcKey: String,
      dstLabel: String, dstKey: String, relType: String, srcCol: String,
      dstCol: String): String =
    s"UNWIND $$batch AS row\n" +
      s"MATCH (a:${ident(srcLabel)} {${ident(srcKey)}: row.${ident(srcCol)}})\n" +
      s"MATCH (b:${ident(dstLabel)} {${ident(dstKey)}: row.${ident(dstCol)}})\n" +
      s"MERGE (a)-[r:${ident(relType)}]->(b)\n" +
      "ON CREATE SET r.count = 1\n" +
      "ON MATCH SET r.count = r.count + 1"

  /** `CREATE INDEX ... IF NOT EXISTS` per (label, property) —
    * databases.py:23 create_index, re-runnable form.
    */
  def indexStatement(label: String, prop: String): String =
    s"CREATE INDEX idx_${ident(label)}_${ident(prop)} IF NOT EXISTS " +
      s"FOR (n:${ident(label)}) ON (n.${ident(prop)})"

  /** One table's load unit: the statement plus where its payload batches
    * land.
    */
  final case class LoadUnit(table: String, statement: String)

  /** Write a table's batch payloads as bounded JSONL (each file ≤
    * `batchSize` rows — the reference's 500-row `$batch` unit, written
    * in parallel by every task instead of a driver loop).
    */
  def writeBatches(df: DataFrame, outDir: String, table: String,
      batchSize: Int = 500, expectEmpty: Boolean = false): Unit = {
    df.write.mode("overwrite")
      // a session-level codec would emit .json.gz part files, which
      // applyLoad's .json filter would silently skip — pin plain text
      .option("compression", "none")
      .option("maxRecordsPerFile", batchSize.toLong)
      .json(s"$outDir/$table")
    // The empty-unit decision needs CALLER INTENT, not just the
    // outcome: a marker stamped on every zero-row staging would turn
    // any upstream bug (broken join key, over-eager filter) into a
    // silent 0-batch load. A caller that KNOWS its mart may filter to
    // nothing declares expectEmpty — only then does a zero-row staging
    // get the marker applyLoad honors as a no-op; undeclared empties
    // fail RIGHT HERE, at staging time, where the bug is. The listing
    // goes through the staging path's own Hadoop filesystem —
    // java.io.File would probe the driver's local disk against a
    // remote defaultFS (the Sinks.fsFor lesson).
    val dir = new org.apache.hadoop.fs.Path(s"$outDir/$table")
    val fs = dir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val hasRows = fs.listStatus(dir)
      .exists(s => s.getPath.getName.endsWith(".json") && s.getLen > 0)
    if (!hasRows) {
      require(expectEmpty,
        s"writeBatches: table '$table' staged ZERO payload rows at $dir " +
          "and the caller did not declare expectEmpty — an undeclared " +
          "empty graph unit is a staging bug, not a no-op")
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, EmptyMarker), true)
      try out.writeBytes("0 rows staged\n") finally out.close()
    }
  }

  /** Staged-empty declaration — see [[writeBatches]]/[[applyLoad]]. */
  private[graft] val EmptyMarker = "_EMPTY"

  /** Stage a full graph load: per-unit payload batches + a manifest of
    * statements (indexes first — databases.py creates indexes before the
    * batch loop). Returns the ordered statements for [[applyLoad]].
    */
  def stageLoad(outDir: String,
      indexes: Seq[(String, String)],
      units: Seq[(LoadUnit, DataFrame)],
      batchSize: Int = 500): Seq[String] = {
    units.foreach { case (u, df) => writeBatches(df, outDir, u.table, batchSize) }
    val statements =
      indexes.map { case (l, p) => indexStatement(l, p) } ++
        units.map { case (u, _) => s"// table: ${u.table}\n${u.statement}" }
    // an index-only load (no units) writes no payload dirs, so nothing
    // has created outDir yet — the manifest write must not assume it
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val path = java.nio.file.Paths.get(outDir, "statements.cypher")
    java.nio.file.Files.writeString(path,
      statements.mkString("", ";\n\n", ";\n"))
    statements
  }

  /** Drive a staged load through a transport: for each unit, every
    * payload file becomes one (statement, batchLines) call — the bolt
    * session's `execute_query(query, {'batch': rows})` shape. Transport
    * is injected: production passes a neo4j-driver session wrapper
    * (bolt is the declared swap-in; this container has zero egress),
    * specs pass a recorder. Returns batches applied per table.
    */
  def applyLoad(outDir: String, units: Seq[LoadUnit],
      transport: (String, Seq[String]) => Unit): Map[String, Long] =
    units.map { u =>
      val dir = new java.io.File(outDir, u.table)
      require(dir.isDirectory,
        s"no staged payload dir for table '${u.table}' at $dir — " +
          "stage the load (stageLoad/writeBatches) before applying it")
      val files = dir.listFiles().toSeq
      val payloads = files.filter(_.getName.endsWith(".json"))
      // a unit that DECLARED itself empty at staging time (writeBatches'
      // marker) is a legitimate no-op — a mart can filter to nothing at
      // a small SF without making the whole load unreplayable
      val declaredEmpty = files.exists(_.getName == EmptyMarker)
      // otherwise an empty graph load must be LOUD, not a silent
      // 0-batch success: no .json part files means either the table
      // staged zero rows unexpectedly or (if part files exist under
      // another suffix) a codec crept in
      require(payloads.nonEmpty || declaredEmpty,
        s"no .json payload files staged for table '${u.table}' at $dir " +
          s"(found: ${files.map(_.getName).filterNot(n =>
            n.startsWith("_") || n.startsWith(".")).sorted.mkString(", ")}) — " +
          "an empty or re-compressed staging would load nothing")
      var batches = 0L
      payloads.sortBy(_.getName)
        .foreach { f =>
          val lines = java.nio.file.Files.readAllLines(f.toPath)
          if (!lines.isEmpty) {
            transport(u.statement, scala.jdk.CollectionConverters
              .ListHasAsScala(lines).asScala.toSeq)
            batches += 1
          }
        }
      require(batches > 0 || declaredEmpty,
        s"table '${u.table}' staged only empty payload files at $dir — " +
          "the load would apply 0 batches; an UNDECLARED zero-row unit " +
          "is a staging bug, not a no-op (writeBatches declares real " +
          "empties with its marker)")
      u.table -> batches
    }.toMap
}
