// stitchio: native runtime plumbing for the TPU stitcher.
//
// C++ replacement for the reference's host-side I/O stack:
//   * BlockingQueue<Mat>        (360_stitcher/blockingqueue.h)   -> FrameQueue
//   * sts_net TCP wrapper       (360_stitcher/netlib.{h,c})      -> plain BSD sockets
//   * capture ingest threads    (360_stitcher/networking.cpp)    -> CaptureServer
//
// Exposed as a C ABI consumed from Python via ctypes (no pybind11 in the
// image). One server instance per process (like the reference's single
// global server socket).
//
// Frame wire format (360_stitcher/defs.h:10-17): each capture board streams
// raw NV12 bytes, frame_bytes = width * height_nv12 (height_nv12 = 3/2 * H).
// Clients are ordered by the last octet of their IP minus client_addr_start
// (netlib.c:122-150); debug_order assigns by accept order instead.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cmath>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct Frame {
    std::vector<uint8_t> data;
};

// MPMC bounded frame queue (drop-oldest policy like clear_buffers /
// RESULTS_MAX_SIZE call sites, 360_stitcher/timed.cpp:141-151).
class FrameQueue {
  public:
    explicit FrameQueue(size_t max_size) : max_size_(max_size) {}

    void push(std::vector<uint8_t>&& data) {
        std::unique_lock<std::mutex> lk(mu_);
        if (max_size_ && q_.size() >= max_size_) {
            q_.pop_front();
            ++dropped_;          // drop-oldest fired: the consumer lost one
        }
        q_.push_back(Frame{std::move(data)});
        cv_.notify_one();
    }

    long dropped() {
        std::unique_lock<std::mutex> lk(mu_);
        return static_cast<long>(dropped_);
    }

    // Returns true and fills out if a frame arrived within timeout_ms
    // (timeout_ms < 0 -> block forever).
    bool pop(std::vector<uint8_t>* out, int timeout_ms) {
        std::unique_lock<std::mutex> lk(mu_);
        auto ready = [&] { return !q_.empty() || closed_; };
        if (timeout_ms < 0) {
            cv_.wait(lk, ready);
        } else if (!cv_.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                                 ready)) {
            return false;
        }
        if (q_.empty()) return false;
        *out = std::move(q_.front().data);
        q_.pop_front();
        return true;
    }

    size_t size() {
        std::unique_lock<std::mutex> lk(mu_);
        return q_.size();
    }

    void close() {
        std::unique_lock<std::mutex> lk(mu_);
        closed_ = true;
        cv_.notify_all();
    }

  private:
    std::mutex mu_;
    std::condition_variable cv_;
    std::deque<Frame> q_;
    size_t max_size_;
    size_t dropped_ = 0;
    bool closed_ = false;
};

// Per-camera ingest health counters (resync/drop accounting; the framed
// protocol below is what makes resyncs detectable at all).
struct CamStats {
    std::atomic<long> frames_ok{0};
    std::atomic<long> resyncs{0};
    std::atomic<long> bytes_skipped{0};
    std::atomic<long> seq_gaps{0};
};

// Framed wire protocol (opt-in): 12-byte little-endian header per frame,
//   magic u32 = 0x53465231 | seq u32 | payload_len u32
// mirrored by io_plane/ingest.py (pack_frame / _recv_loop_framed). The raw
// protocol (the reference's, networking.cpp:15-65) has no way to recover
// from a lost byte; with framing a desync costs at most one frame.
constexpr uint32_t kFrameMagic = 0x53465231;
constexpr size_t kHeaderBytes = 12;

class CaptureServer {
  public:
    CaptureServer(int port, int num_cams, size_t frame_bytes,
                  int client_addr_start, bool debug_order, size_t max_queue,
                  bool framing)
        : port_(port), num_cams_(num_cams), frame_bytes_(frame_bytes),
          client_addr_start_(client_addr_start), debug_order_(debug_order),
          framing_(framing), stats_(num_cams) {
        for (int i = 0; i < num_cams; ++i)
            queues_.emplace_back(new FrameQueue(max_queue));
    }

    bool start() {
        listen_fd_ = ::socket(AF_INET, SOCK_STREAM, 0);
        if (listen_fd_ < 0) return false;
        int one = 1;
        setsockopt(listen_fd_, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
        sockaddr_in addr{};
        addr.sin_family = AF_INET;
        addr.sin_addr.s_addr = INADDR_ANY;
        addr.sin_port = htons(static_cast<uint16_t>(port_));
        if (bind(listen_fd_, reinterpret_cast<sockaddr*>(&addr),
                 sizeof(addr)) < 0 ||
            listen(listen_fd_, num_cams_) < 0) {
            ::close(listen_fd_);       // no destructor: a failed start
            listen_fd_ = -1;           // must not leak the socket
            return false;
        }
        running_ = true;
        accept_thread_ = std::thread([this] { acceptLoop(); });
        return true;
    }

    void stop() {
        running_ = false;
        if (listen_fd_ >= 0) {
            ::shutdown(listen_fd_, SHUT_RDWR);
            ::close(listen_fd_);
            listen_fd_ = -1;
        }
        for (auto& q : queues_) q->close();
        {
            // shutdown (NOT close) under the lock: recvLoops close and
            // deregister their own fd on exit — closing here raced them
            // (double-close of a possibly-recycled fd number) and the
            // unlocked iteration raced acceptLoop's push_back (UB)
            std::lock_guard<std::mutex> lk(mu_);
            for (int fd : client_fds_) ::shutdown(fd, SHUT_RDWR);
        }
        if (accept_thread_.joinable()) accept_thread_.join();
        for (auto& t : client_threads_)
            if (t.joinable()) t.join();
        std::lock_guard<std::mutex> lk(mu_);
        for (int fd : client_fds_) ::close(fd);   // none expected
        client_fds_.clear();
    }

    bool popFrame(int cam, uint8_t* out, int timeout_ms) {
        if (cam < 0 || cam >= num_cams_) return false;
        std::vector<uint8_t> buf;
        if (!queues_[cam]->pop(&buf, timeout_ms)) return false;
        std::memcpy(out, buf.data(), std::min(buf.size(), frame_bytes_));
        return true;
    }

    int queueSize(int cam) {
        if (cam < 0 || cam >= num_cams_) return -1;
        return static_cast<int>(queues_[cam]->size());
    }

    int clientsConnected() { return clients_.load(); }

    bool getStats(int cam, long out[5]) {
        if (cam < 0 || cam >= num_cams_) return false;
        out[0] = stats_[cam].frames_ok.load();
        out[1] = stats_[cam].resyncs.load();
        out[2] = stats_[cam].bytes_skipped.load();
        out[3] = stats_[cam].seq_gaps.load();
        out[4] = queues_[cam]->dropped();
        return true;
    }

  private:
    void acceptLoop() {
        while (running_) {
            sockaddr_in peer{};
            socklen_t len = sizeof(peer);
            int fd = ::accept(listen_fd_, reinterpret_cast<sockaddr*>(&peer),
                              &len);
            if (fd < 0) {
                if (!running_) break;
                continue;
            }
            // camera slot from IP last octet (netlib.c:125-150), or accept
            // order in debug mode (networking.cpp:83-86)
            int slot;
            if (debug_order_) {
                // fresh slots in accept order first, then a dropped
                // board's reconnect takes the lowest freed slot (the
                // old ever-incrementing counter rejected rejoins
                // forever; mirrors io_plane/ingest.py)
                std::lock_guard<std::mutex> lk(mu_);
                if (next_slot_ < num_cams_) {
                    slot = next_slot_++;
                } else if (!free_slots_.empty()) {
                    auto it = std::min_element(free_slots_.begin(),
                                               free_slots_.end());
                    slot = *it;
                    free_slots_.erase(it);
                } else {
                    slot = -1;
                }
            } else {
                uint32_t ip = ntohl(peer.sin_addr.s_addr);
                slot = static_cast<int>(ip & 0xFF) - client_addr_start_;
            }
            if (slot < 0 || slot >= num_cams_) {
                ::close(fd);
                continue;
            }
            clients_.fetch_add(1);
            {
                std::lock_guard<std::mutex> lk(mu_);
                client_fds_.push_back(fd);
                client_threads_.emplace_back(
                    [this, fd, slot] { recvLoop(fd, slot); });
            }
        }
    }

    // Recv-loop exit: close + deregister the fd and (debug-order mode)
    // return the slot so a reconnecting board can rejoin.
    void releaseClient(int fd, int slot) {
        ::close(fd);
        std::lock_guard<std::mutex> lk(mu_);
        client_fds_.erase(
            std::remove(client_fds_.begin(), client_fds_.end(), fd),
            client_fds_.end());
        if (debug_order_ &&
            std::find(free_slots_.begin(), free_slots_.end(), slot) ==
                free_slots_.end())
            free_slots_.push_back(slot);
    }

    // Framed reassembly with magic-scan resync (see kFrameMagic above).
    void recvLoopFramed(int fd, int slot) {
        CamStats& st = stats_[slot];
        std::vector<uint8_t> pending;
        pending.reserve(frame_bytes_ + 64 * 1024 + kHeaderBytes);
        std::vector<uint8_t> buf(64 * 1024);
        uint32_t expect_seq = 0;
        bool have_seq = false;
        bool in_desync = false;
        int error_count = 0;
        const uint8_t magic_le[4] = {0x31, 0x52, 0x46, 0x53};  // LE bytes
        while (running_) {
            ssize_t n = ::recv(fd, buf.data(), buf.size(), 0);
            if (n < 0) {
                if (++error_count > 3) break;
                continue;
            }
            if (n == 0) break;
            error_count = 0;
            pending.insert(pending.end(), buf.data(), buf.data() + n);
            for (;;) {
                if (pending.size() < kHeaderBytes) break;
                uint32_t magic, seq, len;
                std::memcpy(&magic, pending.data(), 4);
                std::memcpy(&seq, pending.data() + 4, 4);
                std::memcpy(&len, pending.data() + 8, 4);
                if (magic != kFrameMagic || len != frame_bytes_) {
                    if (!in_desync) {
                        st.resyncs.fetch_add(1);
                        in_desync = true;
                    }
                    // scan forward for the magic
                    auto it = std::search(pending.begin() + 1, pending.end(),
                                          magic_le, magic_le + 4);
                    if (it == pending.end()) {
                        size_t keep = std::min<size_t>(3, pending.size());
                        st.bytes_skipped.fetch_add(
                            static_cast<long>(pending.size() - keep));
                        pending.erase(pending.begin(),
                                      pending.end() - keep);
                        break;
                    }
                    st.bytes_skipped.fetch_add(
                        static_cast<long>(it - pending.begin()));
                    pending.erase(pending.begin(), it);
                    // in_desync stays set until a VALIDATED header is
                    // consumed below (a false magic inside skipped
                    // garbage must not count a second desync event —
                    // pinned by the Python twin, ingest.py)
                    continue;
                }
                if (pending.size() < kHeaderBytes + frame_bytes_) break;
                in_desync = false;
                if (have_seq && seq != expect_seq) {
                    // forward u32 diff = frames lost in transit; a BACKWARD
                    // jump (sender firmware reset / counter rollover without
                    // a reconnect) would wrap to ~4.29e9 and poison the
                    // counter — treat it as one resync-style event instead
                    uint32_t diff = seq - expect_seq;
                    st.seq_gaps.fetch_add(
                        diff < 0x80000000u ? static_cast<long>(diff) : 1L);
                }
                expect_seq = seq + 1;
                have_seq = true;
                std::vector<uint8_t> frame(
                    pending.begin() + kHeaderBytes,
                    pending.begin() + kHeaderBytes + frame_bytes_);
                pending.erase(pending.begin(),
                              pending.begin() + kHeaderBytes + frame_bytes_);
                queues_[slot]->push(std::move(frame));
                st.frames_ok.fetch_add(1);
            }
        }
        releaseClient(fd, slot);
        clients_.fetch_sub(1);
    }

    // Reassemble fixed-size frames from the byte stream
    // (360_stitcher/networking.cpp:15-65, incl. the 3-error retry policy).
    void recvLoop(int fd, int slot) {
        if (framing_) {
            recvLoopFramed(fd, slot);
            return;
        }
        std::vector<uint8_t> frame(frame_bytes_);
        size_t index = 0;
        int error_count = 0;
        std::vector<uint8_t> buf(64 * 1024);
        while (running_) {
            ssize_t n = ::recv(fd, buf.data(), buf.size(), 0);
            if (n < 0) {
                if (++error_count > 3) break;
                continue;
            }
            if (n == 0) break;
            error_count = 0;
            size_t off = 0;
            while (off < static_cast<size_t>(n)) {
                size_t take = std::min(frame_bytes_ - index,
                                       static_cast<size_t>(n) - off);
                std::memcpy(frame.data() + index, buf.data() + off, take);
                index += take;
                off += take;
                if (index == frame_bytes_) {
                    queues_[slot]->push(std::move(frame));
                    stats_[slot].frames_ok.fetch_add(1);
                    frame.assign(frame_bytes_, 0);
                    index = 0;
                }
            }
        }
        releaseClient(fd, slot);
        clients_.fetch_sub(1);
    }

    int port_;
    int num_cams_;
    size_t frame_bytes_;
    int client_addr_start_;
    bool debug_order_;
    bool framing_;
    std::vector<CamStats> stats_;
    int listen_fd_ = -1;
    std::atomic<bool> running_{false};
    std::atomic<int> clients_{0};
    std::mutex mu_;
    std::vector<std::unique_ptr<FrameQueue>> queues_;
    std::vector<int> client_fds_;
    int next_slot_ = 0;
    std::vector<int> free_slots_;
    std::vector<std::thread> client_threads_;
    std::thread accept_thread_;
};

std::unique_ptr<CaptureServer> g_server;

}  // namespace

extern "C" {

int stitchio_start_server(int port, int num_cams, long frame_bytes,
                          int client_addr_start, int debug_order,
                          long max_queue, int framing) {
    if (g_server) return -1;
    g_server.reset(new CaptureServer(port, num_cams,
                                     static_cast<size_t>(frame_bytes),
                                     client_addr_start, debug_order != 0,
                                     static_cast<size_t>(max_queue),
                                     framing != 0));
    if (!g_server->start()) {
        g_server.reset();
        return -2;
    }
    return 0;
}

int stitchio_pop_frame(int cam, uint8_t* out, int timeout_ms) {
    if (!g_server) return -1;
    return g_server->popFrame(cam, out, timeout_ms) ? 0 : 1;
}

int stitchio_queue_size(int cam) {
    return g_server ? g_server->queueSize(cam) : -1;
}

int stitchio_clients(void) {
    return g_server ? g_server->clientsConnected() : -1;
}

// out[5] = {frames_ok, resyncs, bytes_skipped, seq_gaps, queue_drops}
int stitchio_stats(int cam, long* out) {
    if (!g_server) return -1;
    return g_server->getStats(cam, out) ? 0 : -2;
}

void stitchio_stop_server(void) {
    if (g_server) {
        g_server->stop();
        g_server.reset();
    }
}

// --- NV12 -> packed RGB (BT.601 video range), host-side fallback ---------
// The device path does this in ops/color.py; this exists for host-only
// consumers (e.g. debug_stream preview) and keeps parity with
// networking.cpp:46's cvtColor(CV_YUV2BGR_NV12).
void stitchio_nv12_to_rgb(const uint8_t* nv12, int width, int height,
                          uint8_t* rgb_out) {
    const uint8_t* yp = nv12;
    const uint8_t* uvp = nv12 + static_cast<size_t>(width) * height;
    for (int y = 0; y < height; ++y) {
        const uint8_t* uvrow = uvp + (y / 2) * width;
        for (int x = 0; x < width; ++x) {
            float Y = 1.163999f * std::max(0, yp[y * width + x] - 16);
            float u = static_cast<float>(uvrow[(x / 2) * 2]) - 128.0f;
            float v = static_cast<float>(uvrow[(x / 2) * 2 + 1]) - 128.0f;
            float r = Y + 1.596027f * v;
            float g = Y - 0.812968f * v - 0.391762f * u;
            float b = Y + 2.017232f * u;
            uint8_t* o = rgb_out + (static_cast<size_t>(y) * width + x) * 3;
            o[0] = static_cast<uint8_t>(std::min(255.f, std::max(0.f, r)));
            o[1] = static_cast<uint8_t>(std::min(255.f, std::max(0.f, g)));
            o[2] = static_cast<uint8_t>(std::min(255.f, std::max(0.f, b)));
        }
    }
}

// --- packed RGB -> I420 (BT.601 studio swing), egress fast path ----------
// The egress encoders (x265 / I_PCM / raw) take I420; converting with
// the default jax backend would cost a device round trip per frame on a
// tunneled TPU (and ~1.1 s/frame eager on the 1-core host). This is a
// BIT-EXACT replica of ops/color.py rgb_to_i420: identical f32 op
// order, round-half-to-even, cv's top-left 2x2 chroma subsample — the
// file is compiled with fp-contract off so gcc can't fuse what XLA
// doesn't (timed.cpp:311's cvtColor(BGR2YUV_I420) analog).
#pragma GCC push_options
#pragma GCC optimize("fp-contract=off")
void stitchio_rgb_to_i420(const uint8_t* rgb, int height, int width,
                          uint8_t* out) {
    uint8_t* yp = out;
    uint8_t* up = out + static_cast<size_t>(width) * height;
    uint8_t* vp = up + static_cast<size_t>(width / 2) * (height / 2);
    for (int y = 0; y < height; ++y) {
        const uint8_t* row = rgb + static_cast<size_t>(y) * width * 3;
        const bool crow = (y & 1) == 0;
        for (int x = 0; x < width; ++x) {
            const float r = row[x * 3 + 0];
            const float g = row[x * 3 + 1];
            const float b = row[x * 3 + 2];
            float Y = 0.256788f * r + 0.504129f * g + 0.097906f * b
                      + 16.0f;
            Y = std::nearbyint(Y);
            yp[x] = static_cast<uint8_t>(std::min(255.f,
                                                  std::max(0.f, Y)));
            if (crow && (x & 1) == 0) {
                float U = -0.148223f * r - 0.290993f * g
                          + 0.439216f * b + 128.0f;
                float V = 0.439216f * r - 0.367788f * g
                          - 0.071427f * b + 128.0f;
                U = std::nearbyint(U);
                V = std::nearbyint(V);
                up[x / 2] = static_cast<uint8_t>(
                    std::min(255.f, std::max(0.f, U)));
                vp[x / 2] = static_cast<uint8_t>(
                    std::min(255.f, std::max(0.f, V)));
            }
        }
        yp += width;
        if (crow) {
            up += width / 2;
            vp += width / 2;
        }
    }
}
#pragma GCC pop_options

}  // extern "C"
