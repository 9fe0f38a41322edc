// Reference CPU baseline driver.
//
// #includes the UNMODIFIED reference compute core (s_plus.h, progress_bar.h)
// from the read-only reference checkout (pass -I<ref>/similaripy/cython_code)
// and times its `compute_similarities_parallel` on the staged ML-32M-shaped
// workload, replicating the benchmark protocol (reference:
// tests/benchmarks/benchmark.py:160-189): cosine k=100, block auto
// (DEFAULT_BLOCK_SIZE), all threads, throughput = n_items / seconds.
//
// Usage: ref_bench <data_dir> <k> <rounds> [block_size]
// Prints one line per round and a final JSON summary; dumps the last
// round's top-k (cols int32 + values f32, reordered column space) next to
// the inputs for recall cross-checks against the TPU engine.

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <string>
#include <vector>

#include "s_plus.h"

template <typename T>
static std::vector<T> load(const std::string& path) {
    std::ifstream f(path, std::ios::binary | std::ios::ate);
    if (!f) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); std::exit(1); }
    std::streamsize bytes = f.tellg();
    f.seekg(0);
    std::vector<T> v(bytes / sizeof(T));
    f.read(reinterpret_cast<char*>(v.data()), bytes);
    return v;
}

int main(int argc, char** argv) {
    if (argc < 4) {
        std::fprintf(stderr, "usage: %s <data_dir> <k> <rounds> [block_size]\n", argv[0]);
        return 1;
    }
    const std::string dir = argv[1];
    const int32_t k = std::atoi(argv[2]);
    const int rounds = std::atoi(argv[3]);
    const int32_t block_size =
        argc > 4 ? std::atoi(argv[4]) : s_plus::DEFAULT_BLOCK_SIZE;

    auto m1_data = load<float>(dir + "/m1_data.bin");
    auto m1_indices = load<int32_t>(dir + "/m1_indices.bin");
    auto m1_indptr = load<int32_t>(dir + "/m1_indptr.bin");
    auto m2_data = load<float>(dir + "/m2_data.bin");
    auto m2_indices = load<int32_t>(dir + "/m2_indices.bin");
    auto m2_indptr = load<int32_t>(dir + "/m2_indptr.bin");
    auto xcos = load<float>(dir + "/xcos.bin");
    auto ycos = load<float>(dir + "/ycos.bin");

    const int32_t n_items = static_cast<int32_t>(m1_indptr.size()) - 1;
    const int32_t n_output_cols = static_cast<int32_t>(ycos.size());

    std::vector<int32_t> targets(n_items);
    for (int32_t i = 0; i < n_items; ++i) targets[i] = i;

    std::vector<int32_t> out_rows(static_cast<size_t>(n_items) * k);
    std::vector<int32_t> out_cols(static_cast<size_t>(n_items) * k);
    std::vector<float> out_vals(static_cast<size_t>(n_items) * k);

    double best = 1e30;
    for (int r = 0; r < rounds; ++r) {
        auto t0 = std::chrono::steady_clock::now();
        s_plus::compute_similarities_parallel<int32_t, float>(
            n_items, targets.data(),
            m1_data.data(), m1_indices.data(), m1_indptr.data(),
            m2_data.data(), m2_indices.data(), m2_indptr.data(),
            /*Xtversky*/ nullptr, /*Ytversky*/ nullptr,
            xcos.data(), ycos.data(),
            /*Xdepop*/ nullptr, /*Ydepop*/ nullptr,
            /*a1*/ 1.0f, /*l1*/ 0.0f, /*l2*/ 1.0f, /*l3*/ 0.0f,
            /*t1*/ 1.0f, /*t2*/ 1.0f,
            /*stabilized*/ 0.0f, /*bayesian*/ 0.0f, /*threshold*/ 0.0f,
            k, n_output_cols,
            /*filter_mode*/ 0, nullptr, nullptr,
            /*target_col_mode*/ 0, nullptr, nullptr,
            out_rows.data(), out_cols.data(), out_vals.data(),
            /*progress*/ nullptr,
            /*num_threads*/ 0,
            block_size);
        double dt = std::chrono::duration<double>(
                        std::chrono::steady_clock::now() - t0).count();
        if (dt < best) best = dt;
        std::fprintf(stderr, "# round %d: %.2fs (%.1f items/s)\n",
                     r, dt, n_items / dt);
    }

    {
        std::ofstream f(dir + "/ref_out_cols.bin", std::ios::binary);
        f.write(reinterpret_cast<char*>(out_cols.data()),
                out_cols.size() * sizeof(int32_t));
    }
    {
        std::ofstream f(dir + "/ref_out_vals.bin", std::ios::binary);
        f.write(reinterpret_cast<char*>(out_vals.data()),
                out_vals.size() * sizeof(float));
    }

    std::printf(
        "{\"items_per_s\": %.1f, \"seconds\": %.3f, \"n_items\": %d, "
        "\"k\": %d, \"rounds\": %d, \"block_size\": %d}\n",
        n_items / best, best, n_items, k, rounds, block_size);
    return 0;
}
