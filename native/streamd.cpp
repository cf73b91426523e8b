// streamd — native multi-stream audio ingestion daemon for the serving
// runtime (runtime/server.py binds it via ctypes).
//
// The reference has no serving path at all: its live demo shells out to sox
// for one 0.25 s capture at a time and re-enters Python between frames
// (micloc/record.py:54-60, micloc/xylo_snn_localization.py:446-542).  This
// daemon is the production-shaped TPU twin: N concurrent TCP audio streams
// land in per-stream ring buffers on reader threads; the Python compute
// loop drains at most one chunk per stream per step (the carried-state
// batched TPU step advances every stream exactly one chunk), and DoA
// results are routed back to each stream's socket.
//
// Wire protocol (little-endian):
//   client → server on connect:  u32 magic 0x484D3234 ("HM24"), u32 stream_id
//   client → server frames:      u32 n_floats, then n_floats f32
//                                (time-major mic-interleaved, i.e. row t is
//                                n_mics consecutive floats, matching (Tc, M))
//   server → client per result:  u32 stream_id, f32 doa_radians
//
// Stream ids are client-chosen slots in [0, max_streams); claiming a live
// slot is rejected.  A (re)claimed slot is reported once through
// sd_take_resets so the compute loop zeroes that stream's carried state.
#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x484D3234u;  // "HM24"

struct Stream {
  std::deque<std::vector<float>> ready;  // full chunks awaiting the batch loop
  std::vector<float> partial;            // tail of the last frame, < chunk
  int fd = -1;                           // live socket (results route here)
  bool reset_pending = false;            // new claim: zero carried state first
};

struct Server {
  int listen_fd = -1;
  uint16_t port = 0;
  uint32_t max_streams = 0;
  uint32_t chunk_floats = 0;  // chunk_samples * n_mics
  std::atomic<bool> stopping{false};

  std::mutex mu;
  std::condition_variable ready_cv;
  std::vector<Stream> streams;
  uint32_t rr_cursor = 0;  // round-robin fairness across streams

  std::thread accept_thread;
  std::vector<std::thread> readers;
};

bool read_exact(int fd, void* buf, size_t n) {
  auto* p = static_cast<uint8_t*>(buf);
  while (n > 0) {
    ssize_t r = ::recv(fd, p, n, 0);
    if (r <= 0) return false;
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

bool write_exact(int fd, const void* buf, size_t n) {
  const auto* p = static_cast<const uint8_t*>(buf);
  while (n > 0) {
    ssize_t r = ::send(fd, p, n, MSG_NOSIGNAL);
    if (r <= 0) return false;
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

void reader_loop(Server* s, int fd) {
  uint32_t hdr[2];
  if (!read_exact(fd, hdr, sizeof(hdr)) || hdr[0] != kMagic ||
      hdr[1] >= s->max_streams) {
    ::close(fd);
    return;
  }
  const uint32_t id = hdr[1];
  {
    std::lock_guard<std::mutex> lk(s->mu);
    Stream& st = s->streams[id];
    if (st.fd >= 0) {  // slot already live: reject the newcomer
      ::close(fd);
      return;
    }
    st.fd = fd;
    st.reset_pending = true;
    st.partial.clear();
    st.ready.clear();
  }

  for (;;) {
    // frame header: raw float count (time-major samples × mics interleaved)
    uint32_t n_floats = 0;
    if (s->stopping.load() || !read_exact(fd, &n_floats, 4)) break;
    if (n_floats == 0 || n_floats > (64u << 20)) break;
    std::vector<float> buf(n_floats);
    if (!read_exact(fd, buf.data(), sizeof(float) * n_floats)) break;
    std::lock_guard<std::mutex> lk(s->mu);
    Stream& st = s->streams[id];
    st.partial.insert(st.partial.end(), buf.begin(), buf.end());
    while (st.partial.size() >= s->chunk_floats) {
      st.ready.emplace_back(st.partial.begin(),
                            st.partial.begin() + s->chunk_floats);
      st.partial.erase(st.partial.begin(),
                       st.partial.begin() + s->chunk_floats);
      s->ready_cv.notify_all();
    }
  }
  {
    std::lock_guard<std::mutex> lk(s->mu);
    if (s->streams[id].fd == fd) s->streams[id].fd = -1;
  }
  ::close(fd);
}

void accept_loop(Server* s) {
  for (;;) {
    sockaddr_in peer{};
    socklen_t len = sizeof(peer);
    int fd = ::accept(s->listen_fd, reinterpret_cast<sockaddr*>(&peer), &len);
    if (fd < 0) {
      if (s->stopping.load()) return;
      continue;
    }
    int one = 1;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    std::lock_guard<std::mutex> lk(s->mu);
    if (s->stopping.load()) {
      ::close(fd);
      return;
    }
    s->readers.emplace_back(reader_loop, s, fd);
  }
}

}  // namespace

extern "C" {

void* sd_start(uint16_t port, uint32_t max_streams, uint32_t chunk_samples,
               uint32_t n_mics) {
  auto* s = new Server();
  s->max_streams = max_streams;
  s->chunk_floats = chunk_samples * n_mics;
  s->streams.resize(max_streams);

  s->listen_fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (s->listen_fd < 0) {
    delete s;
    return nullptr;
  }
  int one = 1;
  ::setsockopt(s->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  addr.sin_port = htons(port);
  if (::bind(s->listen_fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) <
          0 ||
      ::listen(s->listen_fd, 64) < 0) {
    ::close(s->listen_fd);
    delete s;
    return nullptr;
  }
  socklen_t alen = sizeof(addr);
  ::getsockname(s->listen_fd, reinterpret_cast<sockaddr*>(&addr), &alen);
  s->port = ntohs(addr.sin_port);
  s->accept_thread = std::thread(accept_loop, s);
  return s;
}

int sd_port(void* h) { return static_cast<Server*>(h)->port; }

// Pop at most one ready chunk per stream (round-robin start for fairness),
// up to max_batch streams.  Blocks up to timeout_ms when nothing is ready.
// data_out row i receives chunk_samples*n_mics floats for ids_out[i].
int sd_next_batch(void* h, uint32_t max_batch, uint32_t timeout_ms,
                  uint32_t* ids_out, float* data_out) {
  auto* s = static_cast<Server*>(h);
  std::unique_lock<std::mutex> lk(s->mu);
  auto any_ready = [&] {
    if (s->stopping.load()) return true;
    for (const auto& st : s->streams)
      if (!st.ready.empty()) return true;
    return false;
  };
  if (!any_ready())
    s->ready_cv.wait_for(lk, std::chrono::milliseconds(timeout_ms), any_ready);
  if (s->stopping.load()) return -1;

  int n = 0;
  const uint32_t S = s->max_streams;
  for (uint32_t k = 0; k < S && n < static_cast<int>(max_batch); ++k) {
    const uint32_t id = (s->rr_cursor + k) % S;
    Stream& st = s->streams[id];
    if (st.ready.empty()) continue;
    ids_out[n] = id;
    std::memcpy(data_out + static_cast<size_t>(n) * s->chunk_floats,
                st.ready.front().data(), sizeof(float) * s->chunk_floats);
    st.ready.pop_front();
    ++n;
  }
  s->rr_cursor = (s->rr_cursor + 1) % (S ? S : 1);
  return n;
}

// Drain the set of slots whose carried state must be zeroed (new claims).
int sd_take_resets(void* h, uint32_t* ids_out, int cap) {
  auto* s = static_cast<Server*>(h);
  std::lock_guard<std::mutex> lk(s->mu);
  int n = 0;
  for (uint32_t id = 0; id < s->max_streams && n < cap; ++id) {
    if (s->streams[id].reset_pending) {
      s->streams[id].reset_pending = false;
      ids_out[n++] = id;
    }
  }
  return n;
}

void sd_post_results(void* h, uint32_t n, const uint32_t* ids,
                     const float* doas) {
  auto* s = static_cast<Server*>(h);
  for (uint32_t i = 0; i < n; ++i) {
    int fd;
    {
      std::lock_guard<std::mutex> lk(s->mu);
      if (ids[i] >= s->max_streams) continue;
      fd = s->streams[ids[i]].fd;
    }
    if (fd < 0) continue;
    uint8_t msg[8];
    std::memcpy(msg, &ids[i], 4);
    std::memcpy(msg + 4, &doas[i], 4);
    write_exact(fd, msg, sizeof(msg));  // drop on failure; reader reaps fd
  }
}

void sd_stop(void* h) {
  auto* s = static_cast<Server*>(h);
  s->stopping.store(true);
  ::shutdown(s->listen_fd, SHUT_RDWR);
  ::close(s->listen_fd);
  {
    std::lock_guard<std::mutex> lk(s->mu);
    for (auto& st : s->streams)
      if (st.fd >= 0) ::shutdown(st.fd, SHUT_RDWR);
    s->ready_cv.notify_all();
  }
  if (s->accept_thread.joinable()) s->accept_thread.join();
  for (auto& t : s->readers)
    if (t.joinable()) t.join();
  delete s;
}

}  // extern "C"
