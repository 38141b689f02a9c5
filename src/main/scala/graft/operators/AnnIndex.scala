package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index (VERDICT r07 #5): the s11 IVF+PQ artifacts —
  * coarse-cell centroids, PQ codebook, and label-partitioned postings
  * (PQ codes per vector) — written as parquet tables through the
  * engine's own sink path, so an index is built ONCE and served from
  * storage, the production shape (FAISS IVFADC persisted: Jégou et al.
  * TPAMI 2011 §V; the in-run build arms are s03/s04/s11).
  *
  * Scale design:
  *  - `centroids`: one row per coarse cell (O(cells) — tiny, broadcast
  *    at query time);
  *  - `codebook`: m·k rows of d doubles (kilobytes — the one driver
  *    collect any PQ serve path performs);
  *  - `postings`: one row per vector `(vec_id, codes)` PARTITIONED BY
  *    the coarse cell, so a probe reads only the probed cells' files —
  *    a static partition filter from the (bounded) probe decision, the
  *    on-disk analog of the in-memory cell cut.
  *
  * All arithmetic matches the in-run arms exactly (exact-integer
  * centroid means, first-k codebook, encodeFast codes, driver ADC
  * table), and parquet round-trips doubles/ints bit-exactly, so the
  * served result is identical to s11's and shares its oracle.
  */
object AnnIndex {

  /** Exact-integer per-cell centroids — the same scaled-long mean the
    * s03/s11 coarse quantizer computes in-run (order-free sums, so the
    * stored centroid is identical across partitionings). */
  private def centroids(e: DataFrame): DataFrame =
    e.select(col("label"),
        posexplode(transform(col("v"), x => round(x * 1e6).cast("long")))
          .as(Seq("i", "x")))
      .groupBy("label", "i")
      .agg(sum("x").as("sx"), count(lit(1)).as("n"))
      .groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("i"), col("sx"), col("n")))),
        t3 => t3.getField("sx").cast("double") /
          (t3.getField("n").cast("double") * lit(1e6))).as("cv"))

  /** Build the index under `dir`: `centroids`, `codebook`, `postings`
    * (partitioned by cell label). */
  def write(emb: DataFrame, idCol: String, embCol: String,
            labelCol: String, m: Int, k: Int, dir: String): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = emb.select(col(idCol).cast("long").as("vec_id"),
      col(labelCol).cast("long").as("label"),
      Similarity.asDouble(col(embCol)).as("v"))
    centroids(e).write.mode("overwrite").parquet(s"$dir/centroids")
    val cb = Quantize.codebookFromFirst(emb, idCol, embCol, m, k)
    cb.zipWithIndex.flatMap { case (ks, slot) =>
      ks.zipWithIndex.map { case (c, code) => (slot, code, c) }
    }.toDF("slot", "code", "c")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/codebook")
    emb.select(col(idCol).cast("long").as("vec_id"),
        col(labelCol).cast("long").as("label"),
        Quantize.encodeFast(col(embCol), cb).as("codes"))
      .where(col("codes").isNotNull)
      .write.mode("overwrite").partitionBy("label")
      .parquet(s"$dir/postings")
  }

  /** Load the stored PQ codebook back into the m x k x d nested shape
    * the in-run arms use (`Quantize.codebookFromFirst`'s type) — the
    * ONE bounded driver collect every PQ serve/encode path performs.
    * Single definition shared by [[append]], [[search]], the w25
    * streaming serve, and the ann_serve scale probe (VERDICT r08 #4:
    * the triplicated inline loaders were a divergence risk). */
  def loadCodebook(spark: SparkSession, dir: String): Seq[Seq[Seq[Double]]] = {
    val rows = spark.read.parquet(s"$dir/codebook")
      .select(col("slot").cast("int"), col("code").cast("int"), col("c"))
      .collect()
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    val arr = Array.ofDim[Seq[Double]](m, k)
    rows.foreach(r => arr(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2))
    arr.map(_.toSeq).toSeq
  }

  /** Incrementally ADD vectors to an existing index (the d34-style
    * incremental arm): new postings are encoded against the STORED
    * codebook — codebooks are train-once artifacts; re-training would
    * silently re-code the whole corpus — and appended into the same
    * cell-partitioned layout (new files land inside each cell's
    * directory; existing files are untouched). Centroids are NOT
    * moved: a production IVF keeps cell geometry stable between full
    * rebuilds so stored codes stay valid, and so does this. */
  def append(emb: DataFrame, idCol: String, embCol: String,
             labelCol: String, dir: String): Unit = {
    val cb = loadCodebook(emb.sparkSession, dir)
    emb.select(col(idCol).cast("long").as("vec_id"),
        col(labelCol).cast("long").as("label"),
        Quantize.encodeFast(col(embCol), cb).as("codes"))
      .where(col("codes").isNotNull)
      .write.mode("append").partitionBy("label")
      .parquet(s"$dir/postings")
  }

  /** Compact FRAGMENTED cells of the postings table (the small-files
    * maintenance pass every append-heavy index needs): each
    * [[append]] lands one new file batch per touched cell, so after
    * many appends a probe of one cell reads dozens of tiny parquet
    * files — footer and open() overhead, not data, starts to dominate
    * the serve scan. Compaction is SELECTIVE: cells whose file count
    * is within `maxFilesPerCell` are not read, rewritten, or even
    * opened — the rewrite cost is proportional to the fragmentation,
    * never to the corpus (at 100 TB a full-table rewrite per
    * maintenance tick would dwarf the appends it cleans up after).
    *
    * One Spark job rewrites ALL fragmented cells (read filtered to
    * those labels, hash-repartitioned by label so each cell lands in
    * exactly one task = one output file), then each cell directory is
    * swapped in with two renames (bounded driver metadata work, one
    * pair per fragmented cell — the same class of driver action as
    * registering a partition in a metastore). A reader never sees a
    * MIX of old and new files — the swap replaces the whole `label=`
    * directory — but between the two renames the cell is briefly
    * absent, so compaction assumes the single-maintainer window every
    * file-based table without a transaction log needs (a production
    * deployment serializes maintenance against serving via the
    * metastore or a Delta-style log; the swap keeps the window to two
    * metadata ops). A failed rename-in restores the original
    * directory and aborts rather than leaving the cell missing. Row
    * content is preserved exactly — [[search]] results are
    * bit-identical pre/post (spec: "compact preserves served
    * results").
    *
    * Returns the labels compacted (empty = nothing fragmented). */
  def compact(spark: SparkSession, dir: String,
              maxFilesPerCell: Int = 1): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(s"$dir/postings")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partFiles(p: Path): Int =
      fs.listStatus(p).count(_.getPath.getName.startsWith("part-"))
    val frag = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("label="))
      .map(st => (st.getPath.getName.stripPrefix("label=").toLong, st.getPath))
      .filter { case (_, p) => partFiles(p) > maxFilesPerCell }
      .sortBy(_._1)
    if (frag.nonEmpty) {
      val tmp = new Path(s"$dir/.postings_compacting")
      fs.delete(tmp, true)
      spark.read.schema("vec_id LONG, codes ARRAY<INT>, label LONG")
        .parquet(s"$dir/postings")
        .filter(col("label").isin(frag.map(_._1): _*))
        .repartition(col("label"))
        .write.mode("overwrite").partitionBy("label").parquet(tmp.toString)
      frag.foreach { case (label, cellPath) =>
        val fresh = new Path(tmp, s"label=$label")
        val retired = new Path(root, s".label=$label.retired")
        require(fs.rename(cellPath, retired),
          s"compact: rename-out failed for label=$label")
        if (!fs.rename(fresh, cellPath)) {
          fs.rename(retired, cellPath) // restore — never leave a cell absent
          throw new IllegalStateException(
            s"compact: rename-in failed for label=$label (original restored)")
        }
        fs.delete(retired, true)
      }
      fs.delete(tmp, true)
    }
    frag.map(_._1)
  }

  /** Serve a query from the STORED tables only: pick the top-`nProbe`
    * cells by centroid cosine (the probe decision — `nProbe` longs,
    * the bounded collect every IVF serve path makes), rebuild the ADC
    * table from the stored codebook (also bounded), and scan ONLY the
    * probed cells' postings via a STATIC partition filter — files of
    * unprobed cells are never listed, let alone read. Ties break
    * exactly as s11 (cscore desc / label asc; adist asc / vec_id
    * asc). */
  def search(spark: SparkSession, dir: String, qv: Seq[Double],
             nProbe: Int, topK: Int, excludeId: Long = -1L): DataFrame = {
    val cells = spark.read.parquet(s"$dir/centroids")
      .select(col("label"),
        Similarity.cosine(col("cv"), typedlit(qv)).as("cscore"))
      .orderBy(col("cscore").desc, col("label").asc)
      .limit(nProbe)
      .select("label")
      .collect().map(_.getLong(0)).toSeq
    val adc = Quantize.adcTable(qv, loadCodebook(spark, dir))
    // explicit schema: partition-type inference would read the label
    // dirs as INT; declaring LONG keeps the partition column native so
    // the isin filter prunes at the partition level
    spark.read.schema("vec_id LONG, codes ARRAY<INT>, label LONG")
      .parquet(s"$dir/postings")
      .filter(col("label").isin(cells: _*))
      .filter(col("vec_id") =!= excludeId)
      .select(col("vec_id"), col("label"),
        round(Quantize.adcDistance(col("codes"), adc), 6).as("adist"))
      .orderBy(col("adist").asc, col("vec_id").asc)
      .limit(topK)
  }
}
