// Conformance driver for the C++ GSL client.
//
// Modes:
//   plan                    — print the canonical 2-hop plan JSON (compared
//                             by tests against Python's query_to_plan output)
//   drive <host> <port> <node_type> <edge_type> <id...>
//                           — install a deterministic 2-hop topk query
//                             against a live ServingServer, run the given
//                             ids, print the response JSON on stdout
//
// This binary is the proof that graph_learn_tpu's plan protocol
// (gsl/plan.py) is language-neutral — the role the reference's Java
// gsl_client plays against DGS (Traversal.java:28-167).

#include <cstdlib>
#include <iostream>
#include <string>
#include <vector>

#include "gsl_client.hpp"

int main(int argc, char** argv) {
  if (argc < 2) {
    std::cerr << "usage: " << argv[0] << " plan | drive <host> <port> "
              << "<node_type> <edge_type> <id...>\n";
    return 2;
  }
  std::string mode = argv[1];
  try {
    if (mode == "plan") {
      glt::Graph g("127.0.0.1", 0);
      auto q = g.V("item").batch(4).alias("src")
                 .outV("rel").sample(3).by("topk").alias("h1")
                 .outV("rel").sample(2).by("topk").alias("h2");
      std::cout << q.plan().dump() << "\n";
      return 0;
    }
    if (mode == "drive") {
      if (argc < 7) {
        std::cerr << "drive needs host port node_type edge_type id...\n";
        return 2;
      }
      glt::Graph g(argv[2], std::atoi(argv[3]));
      std::string ntype = argv[4], etype = argv[5];
      std::vector<int64_t> ids;
      for (int i = 6; i < argc; ++i) ids.push_back(std::atoll(argv[i]));

      glt::Json schema = g.schema();
      std::cerr << "schema: " << schema.dump() << "\n";

      auto q = g.V(ntype).batch(4).alias("src")
                 .outV(etype).sample(3).by("topk").alias("h1")
                 .outV(etype).sample(2).by("topk").alias("h2");
      int qid = g.install(q, /*micro_batch=*/16);
      std::cerr << "installed qid=" << qid << "\n";
      glt::Json out = g.run(qid, ids);
      glt::Json stats = g.stats(qid);
      std::cerr << "stats: " << stats.dump() << "\n";
      std::cout << out.dump() << "\n";
      return 0;
    }
  } catch (const std::exception& e) {
    std::cerr << "error: " << e.what() << "\n";
    return 1;
  }
  std::cerr << "unknown mode " << mode << "\n";
  return 2;
}
