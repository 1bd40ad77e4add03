"""Pose-graph BFS micro-benchmark (rebuild of reference graph.py:72-101)."""
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from neural_graph_mapping_tpu.mapping import graph


def main(num_vertices=1000, num_edges_per_vertex=2, num_tests=1000, max_edges=3):
    random.seed(0)
    g = {i: set() for i in range(num_vertices)}
    for i in range(num_vertices):
        g[i].add((i + 1) % num_vertices)
        g[(i + 1) % num_vertices].add(i)
    for i in range(num_vertices):
        for _ in range(num_edges_per_vertex):
            a = random.randrange(num_vertices)
            g[i].add(a)
            g[a].add(i)

    start = time.time()
    for _ in range(num_tests):
        graph.get_neighbors(g, {0}, max_edges=max_edges, include_queries=True)
    avg = (time.time() - start) / num_tests
    print(f"get_neighbors(max_edges={max_edges}): {avg * 1000:.3f} ms")


if __name__ == "__main__":
    main()
