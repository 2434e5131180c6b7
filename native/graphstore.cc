// Native .b3d graph-store loader + padded-batch filler.
//
// The TPU input pipeline's host-side hot path: mmap a scene's packed window
// graphs and fill fixed-shape padded batch buffers (zero-fill + memcpy) with
// one call, multithreaded across batch slots. Replaces the reference's
// per-item torch.load of 9 pickle files + python padding loops
// (utils/graph_data.py:162-256) and its ray worker pools.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libgraphstore.so graphstore.cc -lpthread
// ABI kept C-only for ctypes.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x47443342;  // "B3DG" little-endian
constexpr int kNumArrays = 12;

// Array indices in the fixed schema (mirrors io/store.py SCHEMA).
enum ArrayId {
  kPose = 0, kImg, kLidar, kRadar, kNodeTime, kNodeClass, kDetIndex,
  kEdgeSrc, kEdgeDst, kEdgeAttr, kEdgeLabel, kEdgeWeight,
};

#pragma pack(push, 1)
struct Entry {
  int32_t dtype;       // 0 = f32, 1 = i32
  int32_t ndim;
  int64_t shape[4];
  int64_t offset;
  int64_t nbytes;
};
#pragma pack(pop)

struct Store {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  int32_t num_windows = 0;
  int32_t arrays_per_window = 0;
  int32_t window_len = 0;
  const int32_t* window_starts = nullptr;
  const Entry* entries = nullptr;

  const Entry& entry(int win, int arr) const {
    return entries[win * arrays_per_window + arr];
  }
  const uint8_t* data(int win, int arr) const {
    return base + entry(win, arr).offset;
  }
};

}  // namespace

extern "C" {

void* b3d_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (base == MAP_FAILED) { ::close(fd); return nullptr; }

  auto* s = new Store();
  s->fd = fd;
  s->base = static_cast<const uint8_t*>(base);
  s->size = st.st_size;

  const uint8_t* p = s->base;
  uint32_t magic;
  memcpy(&magic, p, 4);
  if (magic != kMagic) { munmap(base, st.st_size); ::close(fd); delete s; return nullptr; }
  int32_t version;
  memcpy(&version, p + 4, 4);
  memcpy(&s->num_windows, p + 8, 4);
  memcpy(&s->arrays_per_window, p + 12, 4);
  memcpy(&s->window_len, p + 16, 4);
  s->window_starts = reinterpret_cast<const int32_t*>(p + 20);
  s->entries = reinterpret_cast<const Entry*>(p + 20 + 4 * s->num_windows);
  if (version != 1 || s->arrays_per_window != kNumArrays) {
    munmap(base, st.st_size); ::close(fd); delete s; return nullptr;
  }
  return s;
}

void b3d_close(void* h) {
  auto* s = static_cast<Store*>(h);
  if (!s) return;
  munmap(const_cast<uint8_t*>(s->base), s->size);
  ::close(s->fd);
  delete s;
}

int b3d_num_windows(void* h) { return static_cast<Store*>(h)->num_windows; }
int b3d_window_len(void* h) { return static_cast<Store*>(h)->window_len; }
int b3d_window_start(void* h, int win) {
  return static_cast<Store*>(h)->window_starts[win];
}

// shape_out must hold 4 int64; returns ndim, dtype via dtype_out.
int b3d_array_info(void* h, int win, int arr, int64_t* shape_out, int* dtype_out) {
  const Entry& e = static_cast<Store*>(h)->entry(win, arr);
  for (int i = 0; i < 4; ++i) shape_out[i] = e.shape[i];
  *dtype_out = e.dtype;
  return e.ndim;
}

const void* b3d_array_data(void* h, int win, int arr) {
  return static_cast<Store*>(h)->data(win, arr);
}

int b3d_num_nodes(void* h, int win) {
  return static_cast<int>(static_cast<Store*>(h)->entry(win, kPose).shape[0]);
}
int b3d_num_edges(void* h, int win) {
  return static_cast<int>(static_cast<Store*>(h)->entry(win, kEdgeSrc).shape[0]);
}

// dtype code of the image arrays (0 = f32, 2 = uint8): the code of the
// first window with image data; 0 when no window carries images. Writers
// never mix image dtypes within a store (io/store.py).
int b3d_img_dtype(void* h) {
  auto* s = static_cast<Store*>(h);
  for (int w = 0; w < s->num_windows; ++w)
    if (s->entry(w, kImg).nbytes > 0) return s->entry(w, kImg).dtype;
  return 0;
}

namespace {

// Copy one window into its padded batch slot. All destination buffers are
// pre-zeroed; we only memcpy the real rows and set the masks.
void fill_slot(const Store* s, int win, int slot, int max_nodes, int max_edges,
               float* pose, void* img, int img_itemsize, float* lidar,
               float* radar,
               int32_t* node_time, int32_t* node_class, uint8_t* node_mask,
               int32_t* edge_src, int32_t* edge_dst, float* edge_attr,
               uint8_t* edge_mask, float* edge_label, float* edge_weight) {
  const int n = b3d_num_nodes(const_cast<Store*>(s), win);
  const int e = b3d_num_edges(const_cast<Store*>(s), win);

  auto cp = [&](int arr, void* dst, size_t row_bytes, int rows, size_t max_rows) {
    memcpy(static_cast<uint8_t*>(dst) + slot * max_rows * row_bytes,
           s->data(win, arr), rows * row_bytes);
  };

  cp(kPose, pose, 19 * sizeof(float), n, max_nodes);
  if (s->entry(win, kImg).nbytes > 0)
    // itemsize (f32 vs uint8 crops) validated against nbytes by the caller
    cp(kImg, img, 32 * 32 * 3 * static_cast<size_t>(img_itemsize), n,
       max_nodes);
  if (s->entry(win, kLidar).nbytes > 0)
    cp(kLidar, lidar, 128 * 3 * sizeof(float), n, max_nodes);
  if (s->entry(win, kRadar).nbytes > 0)
    cp(kRadar, radar, 64 * 4 * sizeof(float), n, max_nodes);
  cp(kNodeTime, node_time, sizeof(int32_t), n, max_nodes);
  cp(kNodeClass, node_class, sizeof(int32_t), n, max_nodes);
  cp(kEdgeSrc, edge_src, sizeof(int32_t), e, max_edges);
  cp(kEdgeDst, edge_dst, sizeof(int32_t), e, max_edges);
  cp(kEdgeAttr, edge_attr, 4 * sizeof(float), e, max_edges);
  cp(kEdgeLabel, edge_label, sizeof(float), e, max_edges);
  cp(kEdgeWeight, edge_weight, sizeof(float), e, max_edges);

  memset(node_mask + slot * max_nodes, 1, n);
  memset(edge_mask + slot * max_edges, 1, e);
  // padding nodes get time = -1 (classes/masks already zero)
  for (int i = n; i < max_nodes; ++i)
    node_time[slot * max_nodes + i] = -1;
}

}  // namespace

// Fill a [batch, ...] padded graph batch from the given window indices.
// All output buffers must be caller-allocated; they are zeroed here.
// Returns 0 on success, -1 if any window exceeds the padding budget.
int b3d_fill_padded_batch(
    void* h, const int32_t* win_indices, int batch, int max_nodes, int max_edges,
    float* pose, void* img, int img_itemsize, float* lidar, float* radar,
    int32_t* node_time, int32_t* node_class, uint8_t* node_mask,
    int32_t* edge_src, int32_t* edge_dst, float* edge_attr, uint8_t* edge_mask,
    float* edge_label, float* edge_weight, int num_threads) {
  auto* s = static_cast<Store*>(h);
  for (int b = 0; b < batch; ++b) {
    int w = win_indices[b];
    if (w < 0) continue;
    if (b3d_num_nodes(h, w) > max_nodes || b3d_num_edges(h, w) > max_edges)
      return -1;
    // the caller sized the img buffer from b3d_img_dtype; a mismatched
    // per-window itemsize would over-/under-read — reject instead
    const Entry& ie = s->entry(w, kImg);
    if (ie.nbytes > 0 &&
        ie.nbytes != static_cast<int64_t>(b3d_num_nodes(h, w)) * 32 * 32 * 3 *
                         img_itemsize)
      return -2;
  }

  const size_t bn = static_cast<size_t>(batch) * max_nodes;
  const size_t be = static_cast<size_t>(batch) * max_edges;
  memset(pose, 0, bn * 19 * sizeof(float));
  memset(img, 0, bn * 32 * 32 * 3 * static_cast<size_t>(img_itemsize));
  memset(lidar, 0, bn * 128 * 3 * sizeof(float));
  memset(radar, 0, bn * 64 * 4 * sizeof(float));
  memset(node_time, 0, bn * sizeof(int32_t));
  memset(node_class, 0, bn * sizeof(int32_t));
  memset(node_mask, 0, bn);
  memset(edge_src, 0, be * sizeof(int32_t));
  memset(edge_dst, 0, be * sizeof(int32_t));
  memset(edge_attr, 0, be * 4 * sizeof(float));
  memset(edge_mask, 0, be);
  memset(edge_label, 0, be * sizeof(float));
  memset(edge_weight, 0, be * sizeof(float));

  auto work = [&](int lo, int hi) {
    for (int b = lo; b < hi; ++b) {
      int w = win_indices[b];
      if (w < 0) {  // empty-fill slot: node_time must still read -1
        for (int i = 0; i < max_nodes; ++i)
          node_time[static_cast<size_t>(b) * max_nodes + i] = -1;
        continue;
      }
      fill_slot(s, w, b, max_nodes, max_edges, pose, img, img_itemsize,
                lidar, radar,
                node_time, node_class, node_mask, edge_src, edge_dst,
                edge_attr, edge_mask, edge_label, edge_weight);
    }
  };

  if (num_threads <= 1 || batch <= 1) {
    work(0, batch);
  } else {
    int t = std::min(num_threads, batch);
    std::vector<std::thread> threads;
    int per = (batch + t - 1) / t;
    for (int i = 0; i < t; ++i) {
      int lo = i * per, hi = std::min(batch, lo + per);
      if (lo < hi) threads.emplace_back(work, lo, hi);
    }
    for (auto& th : threads) th.join();
  }
  return 0;
}

}  // extern "C"
