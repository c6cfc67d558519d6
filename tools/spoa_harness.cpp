// Differential-test harness around the reference's ADAPTED spoa
// (the POA engine HyPo vendors with its kLOV/kROV modes and custom
// consensus counting — reference external/spoa).  Compiled directly
// against the read-only reference checkout by build_spoa_harness.sh;
// nothing is vendored into this repository.
//
// stdin:  lines of "MODE\tSEQUENCE" (MODE in {N, L, R})
// argv:   m x g [custom]
// stdout: consensus string; with "custom" also the per-base
//         agreeing-sequence counts (generate_consensus_custom).
#include <cstdio>
#include <cstdlib>
#include <iostream>
#include <string>
#include <vector>

#include "spoa/spoa.hpp"

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr, "usage: %s m x g [custom]\n", argv[0]);
        return 2;
    }
    std::int8_t m = std::atoi(argv[1]);
    std::int8_t x = std::atoi(argv[2]);
    std::int8_t g = std::atoi(argv[3]);
    bool custom = argc > 4 && std::string(argv[4]) == "custom";
    auto graph = spoa::createGraph();
    auto engine = spoa::createAlignmentEngine(spoa::AlignmentType::kNW,
                                              m, x, g);
    std::string line;
    while (std::getline(std::cin, line)) {
        if (line.empty()) continue;
        auto tab = line.find('\t');
        std::string mode = line.substr(0, tab);
        std::string seq = line.substr(tab + 1);
        spoa::AlignmentType t =
            mode == "L" ? spoa::AlignmentType::kLOV
            : mode == "R" ? spoa::AlignmentType::kROV
                          : spoa::AlignmentType::kNW;
        engine->changeAlignType(t);
        auto aln = engine->align(seq, graph);
        graph->add_alignment(aln, seq);
    }
    if (custom) {
        std::vector<std::uint32_t> dst;
        std::string cons = graph->generate_consensus_custom(dst);
        std::cout << cons << "\n";
        for (std::size_t i = 0; i < dst.size(); ++i)
            std::cout << (i ? " " : "") << dst[i];
        std::cout << "\n";
    } else {
        std::cout << graph->generate_consensus() << "\n";
    }
    return 0;
}
