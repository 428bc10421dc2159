// Standalone oracle driver around the reference rANS library.
// Replicates the py_rans.cpp container format (flag byte + per-part size
// headers) so captured streams match what MLCodec_rans would emit.
//
// Usage:
//   oracle cdf <pmf.f32> <n> <precision> <out.u32>
//   oracle enc <cdfs.i32> <ncdfs> <width> <sizes.i32> <offsets.i32>
//              <symbols.i16> <indexes.i16> <n> <stream_part> <out.u8>
//   oracle dec <cdfs.i32> <ncdfs> <width> <sizes.i32> <offsets.i32>
//              <stream.u8> <stream_len> <indexes.i16> <n> <stream_part>
//              <out.i16>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <future>
#include <memory>
#include <string>
#include <vector>

#include "rans.h"

std::vector<uint32_t> pmf_to_quantized_cdf(const std::vector<float> &pmf,
                                           int precision);

template <typename T> static std::vector<T> read_file(const char *path, size_t n) {
  std::vector<T> v(n);
  FILE *f = fopen(path, "rb");
  if (!f || fread(v.data(), sizeof(T), n, f) != n) {
    fprintf(stderr, "read failed: %s\n", path);
    exit(2);
  }
  fclose(f);
  return v;
}

template <typename T> static void write_file(const char *path, const std::vector<T> &v) {
  FILE *f = fopen(path, "wb");
  fwrite(v.data(), sizeof(T), v.size(), f);
  fclose(f);
}

struct CdfGroup {
  std::shared_ptr<std::vector<std::vector<int32_t>>> cdfs;
  std::shared_ptr<std::vector<int32_t>> sizes;
  std::shared_ptr<std::vector<int32_t>> offsets;
};

static CdfGroup load_cdfs(char **argv) {
  int ncdfs = atoi(argv[1]);
  int width = atoi(argv[2]);
  auto flat = read_file<int32_t>(argv[0], (size_t)ncdfs * width);
  auto g = CdfGroup{};
  g.cdfs = std::make_shared<std::vector<std::vector<int32_t>>>(ncdfs);
  for (int i = 0; i < ncdfs; i++)
    g.cdfs->at(i).assign(flat.begin() + (size_t)i * width,
                         flat.begin() + (size_t)(i + 1) * width);
  auto sizes = read_file<int32_t>(argv[3], ncdfs);
  auto offs = read_file<int32_t>(argv[4], ncdfs);
  g.sizes = std::make_shared<std::vector<int32_t>>(sizes);
  g.offsets = std::make_shared<std::vector<int32_t>>(offs);
  return g;
}

int main(int argc, char **argv) {
  std::string mode = argv[1];
  if (mode == "cdf") {
    int n = atoi(argv[3]);
    int precision = atoi(argv[4]);
    auto pmf = read_file<float>(argv[2], n);
    auto cdf = pmf_to_quantized_cdf(pmf, precision);
    write_file(argv[5], cdf);
    return 0;
  }
  if (mode == "enc") {
    auto g = load_cdfs(argv + 2);
    int n = atoi(argv[9]);
    int nparts = atoi(argv[10]);
    auto symbols = read_file<int16_t>(argv[7], n);
    auto indexes = read_file<int16_t>(argv[8], n);
    std::vector<std::shared_ptr<RansEncoderLib>> encs;
    for (int p = 0; p < nparts; p++)
      encs.push_back(std::make_shared<RansEncoderLib>());
    for (auto &e : encs)
      e->add_cdf(g.cdfs, g.sizes, g.offsets);
    // py_rans.cpp:30-45 split (equal chunks, remainder to the last part)
    int each = n / nparts;
    for (int p = 0; p < nparts; p++) {
      int off = p * each;
      int cnt = (p == nparts - 1) ? n - off : each;
      auto vs = std::make_shared<std::vector<int16_t>>(
          symbols.begin() + off, symbols.begin() + off + cnt);
      auto vi = std::make_shared<std::vector<int16_t>>(
          indexes.begin() + off, indexes.begin() + off + cnt);
      encs[p]->encode_with_indexes(vs, vi, 0);
    }
    for (auto &e : encs)
      e->flush();
    // container: py_rans.cpp:93-147
    std::vector<std::vector<uint8_t>> results;
    int maximum = 0, total = 0;
    for (int p = 0; p < nparts; p++) {
      results.push_back(encs[p]->get_encoded_stream());
      int nb = (int)results.back().size();
      if (p < nparts - 1 && nb > maximum)
        maximum = nb;
      total += nb;
    }
    int per_header = maximum > 65535 ? 4 : 2;
    int overhead = 1 + (nparts > 1 ? (nparts - 1) * per_header : 0);
    std::vector<uint8_t> out(total + overhead);
    out[0] = (uint8_t)(((nparts - 1) << 4) + (per_header == 2 ? 1 : 0));
    size_t pos = 1;
    for (int p = 0; p < nparts - 1; p++) {
      uint32_t sz = (uint32_t)results[p].size();
      memcpy(out.data() + pos, &sz, per_header); // little-endian host
      pos += per_header;
    }
    for (auto &r : results) {
      memcpy(out.data() + pos, r.data(), r.size());
      pos += r.size();
    }
    write_file(argv[11], out);
    return 0;
  }
  if (mode == "dec") {
    auto g = load_cdfs(argv + 2);
    int stream_len = atoi(argv[8]);
    int n = atoi(argv[10]);
    int nparts = atoi(argv[11]);
    auto stream = read_file<uint8_t>(argv[7], stream_len);
    auto indexes = read_file<int16_t>(argv[9], n);
    // parse container (py_rans.cpp:150-207)
    uint8_t flag = stream[0];
    int n_streams = (flag >> 4) + 1;
    int per_header = (flag & 0x0F) == 1 ? 2 : 4;
    size_t pos = 1;
    std::vector<size_t> sizes;
    size_t declared = 0;
    for (int p = 0; p < n_streams - 1; p++) {
      uint32_t sz = 0;
      memcpy(&sz, stream.data() + pos, per_header);
      pos += per_header;
      sizes.push_back(sz);
      declared += sz;
    }
    sizes.push_back(stream.size() - pos - declared);
    int each = n / n_streams;
    std::vector<int16_t> out(n);
    std::vector<std::future<void>> futs;
    for (int p = 0; p < n_streams; p++) {
      auto part = std::make_shared<std::vector<uint8_t>>(
          stream.begin() + pos, stream.begin() + pos + sizes[p]);
      pos += sizes[p];
      int off = p * each;
      int cnt = (p == n_streams - 1) ? n - off : each;
      auto vi = std::make_shared<std::vector<int16_t>>(
          indexes.begin() + off, indexes.begin() + off + cnt);
      futs.push_back(std::async(std::launch::async, [&g, part, vi, &out, off] {
        RansDecoderLib dec;
        dec.add_cdf(g.cdfs, g.sizes, g.offsets);
        dec.set_stream(part);
        auto res = dec.decode_stream(vi, 0);
        memcpy(out.data() + off, res.data(), res.size() * sizeof(int16_t));
      }));
    }
    for (auto &f : futs)
      f.get();
    write_file(argv[12], out);
    return 0;
  }
  fprintf(stderr, "unknown mode\n");
  return 1;
}
