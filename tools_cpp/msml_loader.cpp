// Native data loader: mmap'd MXNet IndexedRecordIO + threaded libjpeg decode.
//
// The reference reads training data through mxnet's C++ recordio reader and
// OpenCV's JPEG decode behind a torch DataLoader (datasets/load_dataset.py:
// 39-48, train.py:96-99). This is the TPU-host equivalent: the .rec file is
// mmap'd once, the .idx parsed into a key->offset table, and a batch of
// records decodes in parallel on a C++ thread pool — no GIL, no per-sample
// Python objects, no multiprocess pickling of decoded frames.
//
// On-disk format (mxnet/recordio.h):
//   .idx : text lines "<key>\t<offset>"
//   .rec : [uint32 magic 0xced7230a][uint32 lrecord][payload][pad to 4]
//          lrecord = cflag(upper 3 bits) | length(lower 29 bits)
//   payload: IRHeader{uint32 flag, float label, uint64 id, uint64 id2}
//          + (flag > 0 ? flag * float extended label : none) + jpeg bytes
//
// Exposed C API (ctypes-friendly), see msml_tpu/data/native_loader.py.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <memory>
#include <mutex>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <jpeglib.h>

namespace {

constexpr uint32_t kMagic = 0xced7230a;
constexpr uint32_t kLenMask = (1u << 29) - 1;

struct BatchJob {
  const int64_t* keys;
  int n, out_h, out_w;
  int exact;                            // off-size records are errors
  uint8_t* out_imgs;
  float* out_labels;
  int64_t* err_keys;
  std::atomic<int> next{0}, nerr{0};
};

struct Loader {
  int fd = -1;
  const uint8_t* data = nullptr;
  size_t size = 0;
  std::vector<int64_t> keys;            // sorted .idx keys
  std::vector<uint64_t> offsets;        // parallel to keys
  int nthreads = 1;

  // Persistent decode pool: workers live for the Loader's lifetime (a
  // thread create+join round per batch at nw=32 is a steady host tax);
  // each owns a lazily-sized scratch buffer. Batches hand work over via
  // a generation counter under `mu`.
  std::vector<std::thread> pool;
  std::mutex mu;
  std::condition_variable cv_start, cv_done;
  bool stop = false;
  uint64_t gen = 0;
  int active = 0;
  BatchJob* cur = nullptr;

  int64_t find(int64_t key) const {     // -> offset index or -1
    size_t lo = 0, hi = keys.size();
    while (lo < hi) {
      size_t mid = (lo + hi) / 2;
      if (keys[mid] < key) lo = mid + 1; else hi = mid;
    }
    return (lo < keys.size() && keys[lo] == key) ? (int64_t)lo : -1;
  }
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Growable UNINITIALIZED byte buffer (std::vector value-initializes — a
// 50 MB memset per decode call dwarfed the decode itself).
struct Buf {
  std::unique_ptr<uint8_t[]> p;
  size_t cap = 0;
  uint8_t* ensure(size_t n) {
    if (n > cap) { p.reset(new uint8_t[n]); cap = n; }
    return p.get();
  }
};

// Decode one JPEG to RGB uint8. Returns 0 on success; fills (*w, *h).
// Grayscale sources upsample to RGB (libjpeg replicates the channel exactly,
// matching cv2.IMREAD_COLOR). Output: either a fixed buffer `out_fixed`
// (must hold max_h*max_w*3) or, when `out_buf` is non-null, a growable Buf
// sized to the actual image AFTER the header is read — so a persistent
// per-thread scratch stays image-sized (~37 KB for 112^2 faces) instead of
// pinning max_side^2*3 = 50 MB per pool thread. Fails (-1) past max bounds.
int decode_jpeg(const uint8_t* buf, size_t len, Buf* out_buf,
                uint8_t* out_fixed, int max_h, int max_w, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // cv2 (libjpeg-turbo default) uses the islow IDCT + fancy upsampling;
  // pin both so the pixels are bit-identical to the cv2 reference path.
  cinfo.dct_method = JDCT_ISLOW;
  cinfo.do_fancy_upsampling = TRUE;
  jpeg_start_decompress(&cinfo);
  *h = (int)cinfo.output_height;
  *w = (int)cinfo.output_width;
  if (*h > max_h || *w > max_w || cinfo.output_components != 3) {
    longjmp(jerr.jb, 1);  // unified cleanup
  }
  const size_t stride = (size_t)(*w) * 3;
  uint8_t* out = out_buf ? out_buf->ensure((size_t)(*h) * stride)
                         : out_fixed;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Bilinear resize, half-pixel centers (cv2.INTER_LINEAR convention).
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int dh, int dw) {
  const float sy = (float)sh / dh, sx = (float)sw / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = ((float)y + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (fy < 0) { fy = 0; y0 = 0; }
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - (float)y0;
    for (int x = 0; x < dw; ++x) {
      float fx = ((float)x + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (fx < 0) { fx = 0; x0 = 0; }
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - (float)x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[((size_t)y0 * sw + x0) * 3 + c];
        float v01 = src[((size_t)y0 * sw + x1) * 3 + c];
        float v10 = src[((size_t)y1 * sw + x0) * 3 + c];
        float v11 = src[((size_t)y1 * sw + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[((size_t)y * dw + x) * 3 + c] = (uint8_t)(v + 0.5f);
      }
    }
  }
}

// Parse record at `off`: returns jpeg span + label, or -1 on corruption.
int parse_record(const Loader* L, uint64_t off, const uint8_t** jpeg,
                 size_t* jpeg_len, float* label) {
  if (off + 8 > L->size) return -1;
  uint32_t magic, lrec;
  memcpy(&magic, L->data + off, 4);
  memcpy(&lrec, L->data + off + 4, 4);
  if (magic != kMagic) return -1;
  const uint32_t cflag = lrec >> 29;
  const size_t len = lrec & kLenMask;
  if (cflag != 0) return -1;  // multi-part records unsupported (recordio.py)
  if (off + 8 + len > L->size) return -1;
  const uint8_t* p = L->data + off + 8;
  if (len < 24) return -1;
  uint32_t flag;
  float lab;
  memcpy(&flag, p, 4);
  memcpy(&lab, p + 4, 4);
  size_t hdr = 24 + (size_t)flag * 4;
  if (len < hdr) return -1;
  if (flag > 0) memcpy(&lab, p + 24, 4);  // first extended-label float
  *jpeg = p + hdr;
  *jpeg_len = len - hdr;
  *label = lab;
  return 0;
}

// Drain items from the shared batch job until none remain. `sbuf` is the
// calling thread's persistent decode scratch (sized lazily to the images).
void process_items(const Loader* L, BatchJob* J, Buf& sbuf) {
  const size_t img_sz = (size_t)J->out_h * J->out_w * 3;
  const int max_side = 4096;  // decode bound (raw faces are small)
  for (;;) {
    int i = J->next.fetch_add(1);
    if (i >= J->n) break;
    uint8_t* dst = J->out_imgs + (size_t)i * img_sz;
    J->out_labels[i] = 0.f;
    const uint8_t* jp = nullptr;
    size_t jlen = 0;
    float lab = 0.f;
    int64_t ki = L->find(J->keys[i]);
    int rc = ki < 0 ? -1
             : parse_record(L, L->offsets[ki], &jp, &jlen, &lab);
    int ih = 0, iw = 0;
    if (rc == 0) J->out_labels[i] = lab;  // label valid once parsed (the
                                          // header record has no image)
    if (rc == 0) {
      rc = decode_jpeg(jp, jlen, &sbuf, nullptr, max_side, max_side,
                       &ih, &iw);
    }
    if (rc == 0 && J->exact && (ih != J->out_h || iw != J->out_w)) {
      rc = -3;  // caller wants off-size records reported, not resized
    }
    if (rc == 0) {
      if (ih == J->out_h && iw == J->out_w) {
        memcpy(dst, sbuf.p.get(), img_sz);
      } else {
        resize_bilinear(sbuf.p.get(), ih, iw, dst, J->out_h, J->out_w);
      }
    } else {
      memset(dst, 0, img_sz);
      int e = J->nerr.fetch_add(1);
      if (e < J->n) J->err_keys[e] = J->keys[i];
    }
  }
}

void pool_worker(Loader* L) {
  Buf sbuf;  // persists across batches; sized to the largest image seen
  uint64_t seen = 0;
  for (;;) {
    BatchJob* job = nullptr;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_start.wait(lk, [&] { return L->stop || L->gen != seen; });
      if (L->stop) return;
      seen = L->gen;
      job = L->cur;
    }
    process_items(L, job, sbuf);
    {
      std::lock_guard<std::mutex> lk(L->mu);
      if (--L->active == 0) L->cv_done.notify_all();
    }
  }
}

}  // namespace

extern "C" {

// Bumped whenever the C ABI changes; the Python bindings refuse stale .so
// builds instead of calling with mismatched signatures. v2: persistent
// pool + `exact` batch mode (msml_loader_decode_batch_v2).
int msml_loader_abi_version() { return 2; }

void* msml_loader_open(const char* idx_path, const char* rec_path,
                       int nthreads) {
  auto* L = new Loader();
  L->nthreads = nthreads > 0 ? nthreads : 1;
  {
    std::ifstream f(idx_path);
    if (!f) { delete L; return nullptr; }
    std::vector<std::pair<int64_t, uint64_t>> ents;
    std::string line;
    while (std::getline(f, line)) {
      if (line.empty()) continue;
      char* end = nullptr;
      long long key = strtoll(line.c_str(), &end, 10);
      if (end == line.c_str() || (*end != '\t' && *end != ' ')) continue;
      long long offv = strtoll(end + 1, nullptr, 10);
      ents.emplace_back((int64_t)key, (uint64_t)offv);
    }
    std::sort(ents.begin(), ents.end());
    L->keys.reserve(ents.size());
    L->offsets.reserve(ents.size());
    for (auto& e : ents) { L->keys.push_back(e.first);
                           L->offsets.push_back(e.second); }
  }
  L->fd = open(rec_path, O_RDONLY);
  if (L->fd < 0) { delete L; return nullptr; }
  struct stat st;
  if (fstat(L->fd, &st) != 0) { close(L->fd); delete L; return nullptr; }
  L->size = (size_t)st.st_size;
  void* m = mmap(nullptr, L->size, PROT_READ, MAP_SHARED, L->fd, 0);
  if (m == MAP_FAILED) { close(L->fd); delete L; return nullptr; }
  madvise(m, L->size, MADV_WILLNEED);
  L->data = (const uint8_t*)m;
  if (L->nthreads > 1) {
    L->pool.reserve(L->nthreads);
    for (int t = 0; t < L->nthreads; ++t)
      L->pool.emplace_back(pool_worker, L);
  }
  return L;
}

void msml_loader_close(void* h) {
  auto* L = (Loader*)h;
  if (!L) return;
  if (!L->pool.empty()) {
    {
      std::lock_guard<std::mutex> lk(L->mu);
      L->stop = true;
    }
    L->cv_start.notify_all();
    for (auto& t : L->pool) t.join();
  }
  if (L->data) munmap((void*)L->data, L->size);
  if (L->fd >= 0) close(L->fd);
  delete L;
}

int64_t msml_loader_num_keys(void* h) {
  return (int64_t)((Loader*)h)->keys.size();
}

void msml_loader_keys(void* h, int64_t* out) {
  auto* L = (Loader*)h;
  memcpy(out, L->keys.data(), L->keys.size() * sizeof(int64_t));
}

// Decode records `keys[0..n)` into out_imgs (n, out_h, out_w, 3) uint8 and
// out_labels (n). With exact == 0, images whose decoded size differs from
// (out_h, out_w) are bilinearly resized (cv2 convention); with exact != 0
// they are reported as errors instead, so the caller can decode them
// through a parity-exact path. Returns 0, or the number of failed records;
// failed slots are zero-filled and their key recorded in err_keys
// (capacity n, -1-terminated when fewer). Runs on the persistent pool.
int msml_loader_decode_batch_v2(void* h, const int64_t* keys, int n,
                                int out_h, int out_w, int exact,
                                uint8_t* out_imgs, float* out_labels,
                                int64_t* err_keys) {
  auto* L = (Loader*)h;
  BatchJob job{keys, n, out_h, out_w, exact,
               out_imgs, out_labels, err_keys};
  if (L->pool.empty() || n <= 1) {
    Buf sbuf;
    process_items(L, &job, sbuf);
  } else {
    {
      std::lock_guard<std::mutex> lk(L->mu);
      L->cur = &job;
      L->active = (int)L->pool.size();
      ++L->gen;
    }
    L->cv_start.notify_all();
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_done.wait(lk, [&] { return L->active == 0; });
  }
  int e = job.nerr.load();
  if (e < n) err_keys[e] = -1;
  return e;
}

// v1-compatible entry (always resizes off-size records).
int msml_loader_decode_batch(void* h, const int64_t* keys, int n,
                             int out_h, int out_w, uint8_t* out_imgs,
                             float* out_labels, int64_t* err_keys) {
  return msml_loader_decode_batch_v2(h, keys, n, out_h, out_w, 0,
                                     out_imgs, out_labels, err_keys);
}

// Decode ONE record's raw jpeg bytes span (zero-copy view metadata) —
// used by the Python dataset to decode via libjpeg without re-reading the
// file through Python. Returns jpeg length or -1; *offset is the byte
// offset of the jpeg inside the mmap, *label the record label.
int64_t msml_loader_record_span(void* h, int64_t key, uint64_t* offset,
                                float* label) {
  auto* L = (Loader*)h;
  int64_t ki = L->find(key);
  if (ki < 0) return -1;
  const uint8_t* jp = nullptr;
  size_t jlen = 0;
  if (parse_record(L, L->offsets[ki], &jp, &jlen, label) != 0) return -1;
  *offset = (uint64_t)(jp - L->data);
  return (int64_t)jlen;
}

// Standalone JPEG decode (bytes -> RGB uint8), for parity tests and for
// decoding non-rec sources (IJB loose crops, folder datasets) without cv2.
// Returns 0 and fills (*h, *w) <= (max_h, max_w); out must hold max_h*max_w*3
// laid out at the DECODED stride (w*3), rows packed.
int msml_decode_jpeg(const uint8_t* buf, int64_t len, uint8_t* out,
                     int max_h, int max_w, int* h, int* w) {
  return decode_jpeg(buf, (size_t)len, nullptr, out, max_h, max_w, h, w);
}

}  // extern "C"
