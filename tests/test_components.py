"""Connected-components label propagation."""

from e_commerce_etl_pipeline_spark.extensions.components import connected_components


def test_connected_components_chain_and_islands(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),   # chain -> component 1
         (10, 11),                  # pair  -> component 10
         (20, 21), (21, 20)],       # duplicate/reversed edges tolerated
        "src long, dst long",
    )
    out = {r.node: r.component for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}
