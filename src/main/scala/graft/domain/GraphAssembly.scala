package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M7 — property-graph materialization: collapse the engine's node
  * tables into one (vertices, edges) pair — the DataFrame form of what
  * the reference holds in Neo4j (§1.2/§1.3). Vertices carry
  * (id, label, props-json); edges are key joins made explicit. GraphX/
  * GraphOps algorithms run directly over the edge relation.
  */
object GraphAssembly {

  /** Build a vertex table from a node DataFrame: id = label +
    * surrogate key columns, props = all other columns as JSON (kept
    * structured upstream; JSON only at this boundary, R7).
    */
  def vertices(nodes: DataFrame, label: String, keyCols: Seq[String]): DataFrame = {
    val propCols = nodes.columns.filterNot(keyCols.contains)
    nodes.select(
      concat_ws(":", (lit(label) +: keyCols.map(col)): _*).as("id"),
      lit(label).as("label"),
      to_json(struct(propCols.map(col): _*)).as("props"))
  }

  /** Structured-props variant of [[vertices]]: props as a
    * `map<string,string>` column instead of a JSON string. Same
    * observable semantics at the Cypher surface (every value reads as
    * a string; missing/null keys read null) but the access path is
    * codegen'd GetMapValue instead of an interpreted per-row JSON
    * parse — the production layout for graphs whose props are READ
    * analytically (round-10 verdict: the JSON boundary was the one
    * plan shape not wanted at 100×). [[graft.cypher.CypherCompiler]]
    * picks the access form from the column TYPE, so both layouts are
    * drop-in.
    */
  def verticesMapProps(nodes: DataFrame, label: String,
                       keyCols: Seq[String]): DataFrame = {
    val propCols = nodes.columns.filterNot(keyCols.contains)
    val kvs = propCols.toSeq.flatMap(c => Seq(lit(c), col(c).cast("string")))
    nodes.select(
      concat_ws(":", (lit(label) +: keyCols.map(col)): _*).as("id"),
      lit(label).as("label"),
      map(kvs: _*).as("props"))
  }

  /** Label-as-column variant of [[vertices]]: one DataFrame branch can
    * emit SEVERAL labels (label = a CASE over a discriminator column),
    * so a catalog with families of same-shaped labels unions far fewer
    * branches — each union branch is its own codegen unit and stage, and
    * at 27 labels the per-branch fixed cost dominates the assembly.
    * `props` is explicit because the discriminator feeding `labelCol`
    * must not leak into the props JSON.
    */
  def verticesBy(nodes: DataFrame, labelCol: Column, keyCols: Seq[String],
                 propCols: Seq[String] = Nil): DataFrame =
    nodes.select(
      concat_ws(":", (labelCol +: keyCols.map(col)): _*).as("id"),
      labelCol.as("label"),
      to_json(struct(propCols.map(col): _*)).as("props"))

  /** Rel/label-as-column variant of [[edges]] (same rationale as
    * [[verticesBy]]): one branch per edge FAMILY instead of per type.
    */
  def edgesBy(rel: DataFrame, relCol: Column,
              srcLabelCol: Column, srcKeyCols: Seq[String],
              dstLabelCol: Column, dstKeyCols: Seq[String]): DataFrame =
    rel.select(
      concat_ws(":", (srcLabelCol +: srcKeyCols.map(col)): _*).as("src"),
      concat_ws(":", (dstLabelCol +: dstKeyCols.map(col)): _*).as("dst"),
      relCol.as("rel"))

  /** Edge table from embedded keys: (srcLabel:srcKeys → dstLabel:dstKeys). */
  def edges(rel: DataFrame, relType: String,
            srcLabel: String, srcKeyCols: Seq[String],
            dstLabel: String, dstKeyCols: Seq[String]): DataFrame =
    rel.select(
      concat_ws(":", (lit(srcLabel) +: srcKeyCols.map(col)): _*).as("src"),
      concat_ws(":", (lit(dstLabel) +: dstKeyCols.map(col)): _*).as("dst"),
      lit(relType).as("rel"))

  /** Referential integrity across the assembled graph: edges whose
    * endpoints are missing from the vertex set (SURVEY §5.4 — must be
    * empty).
    */
  def danglingEdges(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val ids = vertices.select(col("id"))
    edges.join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .unionByName(
        edges.join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti"))
  }
}
