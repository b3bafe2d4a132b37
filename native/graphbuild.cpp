// Native graph-builder / kernel-layout engine for textgcn_tpu.
//
// Host-side hot paths that pandas/numpy handle slowly at production scale
// (millions of interactions), implemented as a small C++ library with a
// C ABI consumed via ctypes (textgcn_tpu/native.py):
//
//   * tsv_parse_interactions — two-column TSV (string ids) -> dense int
//     ids in the same order the reference produces them
//     (sort by (user, item) strings, then first-appearance remap —
//     reference dataset.py:45-54,89-98);
//   * build_graph — degree counts + symmetric-normalized edge weights
//     (reference dataset.py:122-138 semantics);
//   * tile_layout_count / tile_layout_fill — the (dst_block x src_block)
//     tiled chunk/group layout for the Pallas one-hot SpMM kernel
//     (textgcn_tpu/ops/pallas_spmm.py PallasDirection), the dominant
//     startup cost for big graphs in the numpy implementation.
//
// Build: make -C native   (produces libgraphbuild.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// TSV parsing + id remap

struct ParsedInteractions {
  std::vector<int32_t> user;   // dense ids, row order = sorted row order
  std::vector<int32_t> item;
  std::vector<std::string> user_ids;  // dense id -> external id
  std::vector<std::string> item_ids;
};

static ParsedInteractions* as_parsed(void* h) {
  return static_cast<ParsedInteractions*>(h);
}

// Parse "user_id\tasin" TSV content (with header). Rows are sorted by
// (user, item) as strings; ids are remapped in first-appearance order of
// the sorted rows, matching the reference's
// sort_values(['user_id','asin']) + unique() remap.
//
// Strictly line-oriented: blank lines are skipped; a line without a tab,
// with more than one tab (extra column) or with an empty field makes the
// whole parse return nullptr — the caller falls back to pandas, which
// raises its own error — instead of silently dropping or fusing rows.
void* tsv_parse_interactions(const char* buf, int64_t len) {
  std::vector<std::pair<std::string_view, std::string_view>> rows;
  const char* p = buf;
  const char* end = buf + len;
  // skip header line
  while (p < end && *p != '\n') p++;
  if (p < end) p++;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) nl = end;
    const char* vend = nl;
    if (vend > p && vend[-1] == '\r') vend--;
    if (vend == p) {  // blank line
      p = nl + 1;
      continue;
    }
    const char* tab = static_cast<const char*>(memchr(p, '\t', vend - p));
    if (!tab || tab == p || tab + 1 == vend ||
        memchr(tab + 1, '\t', vend - tab - 1)) {
      return nullptr;  // malformed row: no/extra column or empty field
    }
    rows.emplace_back(std::string_view(p, tab - p),
                      std::string_view(tab + 1, vend - tab - 1));
    p = nl + 1;
  }
  std::sort(rows.begin(), rows.end());

  auto* out = new ParsedInteractions();
  out->user.reserve(rows.size());
  out->item.reserve(rows.size());
  std::unordered_map<std::string_view, int32_t> umap, imap;
  for (auto& [u, i] : rows) {
    auto uit = umap.find(u);
    if (uit == umap.end()) {
      uit = umap.emplace(u, static_cast<int32_t>(umap.size())).first;
      out->user_ids.emplace_back(u);
    }
    auto iit = imap.find(i);
    if (iit == imap.end()) {
      iit = imap.emplace(i, static_cast<int32_t>(imap.size())).first;
      out->item_ids.emplace_back(i);
    }
    out->user.push_back(uit->second);
    out->item.push_back(iit->second);
  }
  return out;
}

int64_t parsed_n_rows(void* h) { return as_parsed(h)->user.size(); }
int64_t parsed_n_users(void* h) { return as_parsed(h)->user_ids.size(); }
int64_t parsed_n_items(void* h) { return as_parsed(h)->item_ids.size(); }

void parsed_copy_edges(void* h, int32_t* user_out, int32_t* item_out) {
  auto* ph = as_parsed(h);
  memcpy(user_out, ph->user.data(), ph->user.size() * sizeof(int32_t));
  memcpy(item_out, ph->item.data(), ph->item.size() * sizeof(int32_t));
}

// external ids serialized as '\n'-joined; returns required byte length
int64_t parsed_ids_size(void* h, int which) {
  auto& v = which == 0 ? as_parsed(h)->user_ids : as_parsed(h)->item_ids;
  int64_t n = 0;
  for (auto& s : v) n += s.size() + 1;
  return n;
}

void parsed_copy_ids(void* h, int which, char* out) {
  auto& v = which == 0 ? as_parsed(h)->user_ids : as_parsed(h)->item_ids;
  for (auto& s : v) {
    memcpy(out, s.data(), s.size());
    out += s.size();
    *out++ = '\n';
  }
}

void parsed_free(void* h) { delete as_parsed(h); }

// ---------------------------------------------------------------------------
// graph build: degrees + symmetric normalization

void build_graph(const int32_t* eu, const int32_t* ei, int64_t n_edges,
                 int32_t n_users, int32_t n_items, int32_t* du_out,
                 int32_t* di_out, float* w_out) {
  std::vector<int32_t> du(n_users, 0), di(n_items, 0);
  for (int64_t e = 0; e < n_edges; ++e) {
    du[eu[e]]++;
    di[ei[e]]++;
  }
  for (int64_t e = 0; e < n_edges; ++e) {
    double d = static_cast<double>(du[eu[e]]) * di[ei[e]];
    w_out[e] = d > 0 ? static_cast<float>(1.0 / std::sqrt(d)) : 0.0f;
  }
  memcpy(du_out, du.data(), n_users * sizeof(int32_t));
  memcpy(di_out, di.data(), n_items * sizeof(int32_t));
}

// ---------------------------------------------------------------------------
// Pallas tile layout (mirrors PallasDirection's numpy construction)

struct TileLayout {
  std::vector<int32_t> packed;     // n_chunks*CHUNK: dst_local<<16|src_local
  std::vector<float> w;            // n_chunks*CHUNK
  std::vector<int32_t> sb;         // n_chunks (source block per chunk)
  std::vector<int32_t> group_ptr;  // n_dst_blocks+1 (in group units)
  std::vector<int32_t> dst_ids;    // n_chunks*CHUNK (-1 = padding)
  std::vector<int32_t> src_ids;
  int64_t n_chunks = 0;
  int32_t max_groups = 0;
};

void* tile_layout_build(const int32_t* src, const int32_t* dst,
                        const float* w, int64_t n_edges, int32_t n_src_pad,
                        int32_t n_dst, int32_t dst_block, int32_t src_block,
                        int32_t chunk, int32_t group) {
  const int32_t n_src_blocks = n_src_pad / src_block;
  const int32_t n_dst_blocks = std::max(1, (n_dst + dst_block - 1) / dst_block);

  // sort edge indices by tile id (stable)
  std::vector<int64_t> tile(n_edges);
  for (int64_t e = 0; e < n_edges; ++e)
    tile[e] = static_cast<int64_t>(dst[e] / dst_block) * n_src_blocks +
              src[e] / src_block;
  std::vector<int64_t> order(n_edges);
  for (int64_t e = 0; e < n_edges; ++e) order[e] = e;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return tile[a] < tile[b]; });

  auto* L = new TileLayout();
  // walk tile runs; per tile emit ceil(count/chunk) chunks; group-pad per
  // dst block
  std::vector<int32_t> block_groups(n_dst_blocks, 0);
  // first pass: chunks per dst block
  {
    int64_t e = 0;
    std::vector<int64_t> block_chunks(n_dst_blocks, 0);
    while (e < n_edges) {
      int64_t t0 = tile[order[e]];
      int64_t run = e;
      while (run < n_edges && tile[order[run]] == t0) run++;
      int64_t n_chunks_tile = (run - e + chunk - 1) / chunk;
      block_chunks[t0 / n_src_blocks] += n_chunks_tile;
      e = run;
    }
    for (int32_t b = 0; b < n_dst_blocks; ++b)
      block_groups[b] = static_cast<int32_t>(
          (block_chunks[b] + group - 1) / group);
  }
  L->group_ptr.resize(n_dst_blocks + 1, 0);
  for (int32_t b = 0; b < n_dst_blocks; ++b) {
    L->group_ptr[b + 1] = L->group_ptr[b] + block_groups[b];
    L->max_groups = std::max(L->max_groups, block_groups[b]);
  }
  if (L->max_groups == 0) L->max_groups = 1;
  // always a whole number of groups so the (n_groups, GROUP, CHUNK)
  // reshape on the python side is exact
  L->n_chunks = std::max<int64_t>(
      static_cast<int64_t>(L->group_ptr[n_dst_blocks]) * group, group);

  const int64_t total = L->n_chunks * chunk;
  L->packed.assign(total, 0);
  L->w.assign(total, 0.0f);
  L->sb.assign(L->n_chunks, 0);
  L->dst_ids.assign(total, -1);
  L->src_ids.assign(total, -1);

  // second pass: fill
  int64_t e = 0;
  int32_t cur_block = 0;
  int64_t chunk_cursor = 0;  // global chunk index
  auto advance_block = [&](int32_t to_block) {
    // pad current block's chunks up to its group boundary
    while (cur_block < to_block) {
      chunk_cursor = static_cast<int64_t>(L->group_ptr[cur_block + 1]) * group;
      cur_block++;
    }
  };
  while (e < n_edges) {
    int64_t t0 = tile[order[e]];
    int32_t blk = static_cast<int32_t>(t0 / n_src_blocks);
    int32_t sblk = static_cast<int32_t>(t0 % n_src_blocks);
    advance_block(blk);
    int64_t run = e;
    while (run < n_edges && tile[order[run]] == t0) run++;
    int64_t cnt = run - e;
    int64_t n_chunks_tile = (cnt + chunk - 1) / chunk;
    for (int64_t c = 0; c < n_chunks_tile; ++c) {
      int64_t ci = chunk_cursor + c;
      L->sb[ci] = sblk;
      for (int64_t j = 0; j < chunk; ++j) {
        int64_t k = c * chunk + j;
        int64_t slot = ci * chunk + j;
        if (k < cnt) {
          int64_t eo = order[e + k];
          int32_t dl = dst[eo] % dst_block;
          int32_t sl = src[eo] % src_block;
          L->packed[slot] = (dl << 16) | sl;
          L->w[slot] = w[eo];
          L->dst_ids[slot] = dst[eo];
          L->src_ids[slot] = src[eo];
        }  // else stays padding (0 / w=0 / -1)
      }
    }
    chunk_cursor += n_chunks_tile;
    e = run;
  }
  return L;
}

static TileLayout* as_layout(void* h) { return static_cast<TileLayout*>(h); }

int64_t layout_n_chunks(void* h) { return as_layout(h)->n_chunks; }
int32_t layout_max_groups(void* h) { return as_layout(h)->max_groups; }

void layout_copy(void* h, int32_t* packed, float* w, int32_t* sb,
                 int32_t* group_ptr, int32_t* dst_ids, int32_t* src_ids) {
  auto* L = as_layout(h);
  memcpy(packed, L->packed.data(), L->packed.size() * sizeof(int32_t));
  memcpy(w, L->w.data(), L->w.size() * sizeof(float));
  memcpy(sb, L->sb.data(), L->sb.size() * sizeof(int32_t));
  memcpy(group_ptr, L->group_ptr.data(),
         L->group_ptr.size() * sizeof(int32_t));
  memcpy(dst_ids, L->dst_ids.data(), L->dst_ids.size() * sizeof(int32_t));
  memcpy(src_ids, L->src_ids.data(), L->src_ids.size() * sizeof(int32_t));
}

void layout_free(void* h) { delete as_layout(h); }

}  // extern "C"
