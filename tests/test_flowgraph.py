"""Multi-hop flow compilation (MultiHopFlowCompiler.java:258): BFS
path search with format chaining, template instantiation, and compiled
flows executing end-to-end on run_flow."""

import os

import pytest

from gobblin_spark.plans import flow as FL, flowgraph as FG


def toy_graph():
    g = FG.FlowGraph()
    for nid in ("src", "staging", "warehouse", "island"):
        g.add_node(FG.DataNode(nid, props={"root": f"/data/{nid}"}))
    g.add_edge(FG.FlowEdge("ingest", "src", "staging", "t1",
                           output_format="avro"))
    g.add_edge(FG.FlowEdge("convert", "staging", "warehouse", "t2",
                           input_format="avro", output_format="orc"))
    # a direct edge that only accepts parquet input — format-incompatible
    g.add_edge(FG.FlowEdge("direct", "src", "warehouse", "t3",
                           input_format="parquet", output_format="orc"))
    return g


def test_bfs_shortest_path_and_format_chaining():
    g = toy_graph()
    # parquet in hand → the 1-hop 'direct' edge wins
    path = g.find_path("src", "warehouse", input_format="parquet")
    assert [e.id for e in path] == ["direct"]
    # avro in hand → must go the 2-hop ingest→convert way
    path = g.find_path("src", "warehouse", input_format="any")
    assert [e.id for e in path] in (["direct"], ["ingest", "convert"])
    path = g.find_path("src", "warehouse", input_format="json")
    assert [e.id for e in path] == ["ingest", "convert"]
    # no route to an unconnected node
    assert g.find_path("src", "island") is None
    with pytest.raises(ValueError, match="No path|no path"):
        FG.compile_flow(g, "f", "src", "island")


def test_inactive_edges_and_nodes_excluded():
    g = toy_graph()
    g.remove_edge("direct")
    assert [e.id for e in g.find_path("src", "warehouse")] == ["ingest", "convert"]
    g.node("staging").active = False
    assert g.find_path("src", "warehouse") is None


def test_output_format_constraint():
    g = toy_graph()
    g.add_edge(FG.FlowEdge("export", "warehouse", "island", "t4",
                           input_format="orc", output_format="csv"))
    path = g.find_path("src", "island", input_format="json",
                       output_format="csv")
    assert [e.id for e in path] == ["ingest", "convert", "export"]
    assert g.find_path("src", "island", input_format="json",
                       output_format="parquet") is None


def test_template_instantiation_fills_node_props():
    g = FG.FlowGraph()
    g.add_node(FG.DataNode("src", props={"root": "/data/src"}))
    g.add_node(FG.DataNode("staging", props={"root": "/data/staging"}))
    g.add_edge(FG.FlowEdge("tmpl", "src", "staging",
                           "in={src.root}\nout={dst.root}\njob={flow.name}"))
    spec = FG.compile_flow(g, "myflow", "src", "staging",
                           ctx={"name": "myflow"}, input_format="parquet")
    # shortest path is 1 hop; template text got node + ctx fills
    cfg = spec.jobs[0].config
    assert "in=/data/src" in cfg and "out=/data/staging" in cfg
    assert "job=myflow" in cfg


def test_compiled_three_hop_flow_executes(spark, sf_dir, tmp_path):
    """Compile a 3-hop spec and run it through the existing run_flow:
    table → filtered parquet → projected parquet → final parquet, each
    hop reading the previous hop's published dir."""
    a, b, c = (str(tmp_path / d) for d in ("hopA", "hopB", "hopC"))
    g = FG.FlowGraph()
    g.add_node(FG.DataNode("lake", props={"sf": sf_dir}))
    g.add_node(FG.DataNode("stageA", props={"dir": a}))
    g.add_node(FG.DataNode("stageB", props={"dir": b}))
    g.add_node(FG.DataNode("mart", props={"dir": c}))
    g.add_edge(FG.FlowEdge("pull", "lake", "stageA", (
        "job.name=pull\nsource.class=table\n"
        "source.data.directory={src.sf}\nsource.table.name=orders\n"
        "converter.classes=filter_regex\nconverter.filter.field=o_orderpriority\n"
        "converter.filter.pattern=^1-URGENT$\n"
        "data.publisher.final.dir={dst.dir}\n"), output_format="parquet"))
    g.add_edge(FG.FlowEdge("project", "stageA", "stageB", (
        "job.name=project\nsource.class=parquet\n"
        "source.filebased.data.directory={src.dir}\n"
        "converter.classes=pick_fields\n"
        "converter.fields.to.pick=o_orderkey,o_custkey,o_totalprice\n"
        "data.publisher.final.dir={dst.dir}\n"),
        input_format="parquet", output_format="parquet"))
    g.add_edge(FG.FlowEdge("load", "stageB", "mart", (
        "job.name=load\nsource.class=parquet\n"
        "source.filebased.data.directory={src.dir}\n"
        "data.publisher.final.dir={dst.dir}\n"),
        input_format="parquet", output_format="parquet"))

    spec = FG.compile_flow(g, "urgent_orders", "lake", "mart")
    assert [j.name for j in spec.jobs] == [
        "urgent_orders-hop0-pull", "urgent_orders-hop1-project",
        "urgent_orders-hop2-load"]
    assert spec.jobs[1].depends_on == ("urgent_orders-hop0-pull",)
    assert spec.jobs[2].depends_on == ("urgent_orders-hop1-project",)

    res = FL.run_flow(spec, spark)
    assert res.succeeded, res.errors
    from gobblin_spark.sources import files as FS

    final = spark.read.parquet(c)
    orders = FS.load_table(spark, sf_dir, "orders")
    expect = orders.filter("o_orderpriority = '1-URGENT'").count()
    assert final.count() == expect
    assert set(final.columns) == {"o_orderkey", "o_custkey", "o_totalprice"}
    assert os.path.exists(os.path.join(c, "_SUCCESS"))


def test_inactive_endpoints_block_path():
    """Audit r10: an inactive SOURCE node must block compilation the
    same way an inactive destination/intermediate always did."""
    import pytest

    from gobblin_spark.plans import flowgraph as FG

    g = FG.FlowGraph()
    g.add_node(FG.DataNode("a"))
    g.add_node(FG.DataNode("b"))
    g.add_edge(FG.FlowEdge("e", "a", "b", "k=v\n"))
    assert g.find_path("a", "b") is not None

    g.node("a").active = False
    assert g.find_path("a", "b") is None
    with pytest.raises(ValueError, match="no path"):
        FG.compile_flow(g, "f", "a", "b")
    g.node("a").active = True
    g.node("b").active = False
    assert g.find_path("a", "b") is None
    g.node("b").active = True
    assert g.find_path("a", "b") is not None
