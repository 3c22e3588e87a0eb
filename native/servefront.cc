// Native HTTP request front for the serving path (serve_native.py).
//
// The measured r5 serving ceiling (PARITY.md) moved from the chip to
// the HOST: the stdlib ThreadingHTTPServer front delivers 420 req/s
// while the same MicroBatcher+Predictor path reaches 1248 req/s when
// requests are submitted in-process — the 3x gap is per-request Python
// work (HTTP parse, one OS thread per connection thrashing the GIL,
// json-decoding nested adjacency lists). This file moves ALL
// per-request work into C++:
//
//   - one epoll event loop thread: accept, nonblocking reads, minimal
//     HTTP/1.1 parsing (request line + Content-Length + Connection),
//     keep-alive, partial-write handling via EPOLLOUT;
//   - a mutex+condvar request queue; the Python worker pulls a
//     deadline-coalesced BATCH of raw request bodies in ONE ctypes
//     call (lnfront_next_batch) — the GIL is crossed once per batch,
//     not once per request;
//   - responses are enqueued from Python threads (lnfront_respond);
//     an eventfd wakes the loop to flush them. A request id encodes
//     (connection slot, generation) so a response racing a dead
//     connection is dropped safely.
//
// GET /healthz and unknown-model 404s are answered without touching
// Python at all; model names are registered up front and matched in
// C++ (lnfront_register_model). The wire format of request bodies is
// opaque here — Python decodes them (serve_native.py's binary graph
// codec) — so the front is reusable for any body format.
//
// Reference parity note: the upstream repo (lrjconan/LanczosNetwork)
// has NO serving; this is part of the production-deployment surface
// SURVEY.md §5 calls for, in native code per the framework contract.

#include <arpa/inet.h>
#include <errno.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <string.h>
#include <sys/epoll.h>
#include <sys/eventfd.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cctype>
#include <chrono>
#include <cstdlib>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

using Clock = std::chrono::steady_clock;

struct Request {
  uint64_t id;
  int model_idx;
  std::string body;
};

struct Conn {
  int fd = -1;
  uint32_t gen = 0;       // bumped on close; stale responds are dropped
  std::string in;         // read buffer (headers + body accumulate here)
  std::string out;        // pending response bytes
  size_t out_off = 0;
  bool want_close = false;  // close after out drains
  bool epollout = false;    // EPOLLOUT currently armed
  // parsed request state
  bool have_header = false;
  size_t header_end = 0;
  size_t content_len = 0;
  bool keep_alive = true;
  std::string method, path;
  int inflight = 0;  // requests handed to Python, not yet responded
};

struct Server {
  int listen_fd = -1;
  int epoll_fd = -1;
  int wake_fd = -1;
  uint16_t port = 0;
  std::thread loop;
  std::atomic<bool> stop{false};

  std::vector<std::string> models;       // registered model names
  std::string models_json;               // body for GET /v1/models

  std::mutex mu;                          // guards everything below
  std::condition_variable cv;             // request queue signal
  std::deque<Request> queue;
  size_t queue_cap = 4096;                // backpressure: 503 beyond
  std::unordered_map<int, Conn> conns;    // fd -> conn
  // responses enqueued by Python, drained by the loop thread
  struct Out {
    uint64_t id;
    int status;
    std::string body;
    std::string content_type;
  };
  std::deque<Out> outbox;
  std::atomic<uint64_t> served{0};
  std::atomic<uint64_t> transcoded{0};  // JSON bodies rewritten to LNG1
};

std::mutex g_servers_mu;
std::unordered_map<int, Server*> g_servers;
int g_next_id = 1;

uint64_t req_id(int fd, uint32_t gen) {
  return (uint64_t(gen) << 24) | uint64_t(fd & 0xffffff);
}
int req_fd(uint64_t id) { return int(id & 0xffffff); }
uint32_t req_gen(uint64_t id) { return uint32_t(id >> 24); }

// Request ids pack (gen << 24 | fd) into bits 0..55; bit 63 marks a
// body that arrived as the JSON wire and was transcoded to LNG1 here
// — lnfront_respond transcodes the LNP1 answer back to JSON. The bit
// survives the Python round trip for free (ids are opaque uint64s)
// and drops out of req_fd/req_gen, so no side table is needed.
constexpr uint64_t kJsonBit = 1ull << 63;

// ---- JSON <-> binary wire transcode ----------------------------------------
//
// The r5b saturation sweep (PARITY.md) measured the JSON wire at ~2x
// slower than the binary codec through this same front at low-mid
// concurrency: the one per-request Python step left was the worker's
// json.loads over nested adjacency lists. This section removes it for
// schema-conforming requests by rewriting the serve_http JSON wire
//
//   {"graphs": [{"atom_type": [...], "adj": [[..]] | [[[..]]],
//                "node_feat": [[..]]?}, ...]}
//
// to the LNG1 binary codec (serve_native.py module docstring) before
// the body is queued, in this loop thread. Anything the binary wire
// cannot carry — non-integral or out-of-[0,255] adjacency weights,
// unknown keys, ragged rows, malformed JSON — leaves the body
// untouched and the Python worker's JSON path handles it (including
// producing the 400s, so error text stays single-sourced).

struct Jp {
  const char* p;
  const char* end;
  void ws() {
    while (p < end &&
           (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      p++;
  }
  bool lit(char c) {
    ws();
    if (p < end && *p == c) {
      p++;
      return true;
    }
    return false;
  }
  char peek() {
    ws();
    return p < end ? *p : '\0';
  }
  // "key" — escapes never appear in this schema's keys; any '\'
  // makes the caller fall back to Python
  bool key(std::string& out) {
    if (!lit('"')) return false;
    const char* start = p;
    while (p < end && *p != '"') {
      if (*p == '\\') return false;
      p++;
    }
    if (p >= end) return false;
    out.assign(start, size_t(p - start));
    p++;  // closing quote
    return true;
  }
  bool num(double& v) {
    ws();
    if (p >= end || !(*p == '-' || (*p >= '0' && *p <= '9'))) return false;
    char* q = nullptr;
    v = strtod(p, &q);  // std::string buffers are NUL-terminated
    if (q == p) return false;
    p = q;
    return true;
  }
  // [n, n, ...] — one flat row of numbers (non-empty)
  bool num_row(std::vector<double>& out) {
    out.clear();
    if (!lit('[')) return false;
    if (peek() == ']') return false;  // empty rows are never valid here
    for (;;) {
      double v;
      if (!num(v)) return false;
      out.push_back(v);
      if (lit(',')) continue;
      return lit(']');
    }
  }
};

bool integral_u8(double v) {
  return v >= 0.0 && v <= 255.0 && v == double(uint8_t(v));
}

void put_u16(std::string& s, uint32_t v) {
  s.push_back(char(v & 0xff));
  s.push_back(char((v >> 8) & 0xff));
}
void put_u32(std::string& s, uint32_t v) {
  put_u16(s, v & 0xffff);
  put_u16(s, v >> 16);
}

// one {"atom_type": ..., "adj": ..., "node_feat"?: ...} object -> the
// LNG1 per-graph record appended to out; false = fall back to Python
bool transcode_graph(Jp& j, std::string& out) {
  if (!j.lit('{')) return false;
  std::vector<double> atom, row;
  std::vector<std::vector<double>> adj_rows;  // flattened (e*n) rows
  std::vector<std::vector<double>> feat_rows;
  size_t adj_e = 0;  // 0 = not seen, else edge-type count
  bool have_atom = false, have_adj = false, have_feat = false;
  if (j.peek() != '}') {
    for (;;) {
      std::string k;
      if (!j.key(k) || !j.lit(':')) return false;
      if (k == "atom_type") {
        if (have_atom || !j.num_row(atom)) return false;
        have_atom = true;
      } else if (k == "adj") {
        if (have_adj || !j.lit('[')) return false;
        have_adj = true;
        // 2-D ([n][n], e=1) or 3-D ([e][n][n]) by lookahead
        if (j.peek() != '[') return false;
        const char* save = j.p;
        Jp probe = j;
        bool three_d = probe.lit('[') && probe.peek() == '[';
        j.p = save;
        adj_e = 1;
        if (three_d) {
          adj_e = 0;
          for (;;) {
            if (!j.lit('[')) return false;
            adj_e++;
            if (j.peek() != '[') return false;
            for (;;) {
              if (!j.num_row(row)) return false;
              adj_rows.push_back(row);
              if (j.lit(',')) continue;
              if (!j.lit(']')) return false;
              break;
            }
            if (j.lit(',')) continue;
            if (!j.lit(']')) return false;
            break;
          }
        } else {
          for (;;) {
            if (!j.num_row(row)) return false;
            adj_rows.push_back(row);
            if (j.lit(',')) continue;
            if (!j.lit(']')) return false;
            break;
          }
        }
      } else if (k == "node_feat") {
        if (have_feat) return false;
        // null is the JSON wire's "absent"
        if (j.peek() == 'n') {
          if (j.end - j.p < 4 || memcmp(j.p, "null", 4) != 0) return false;
          j.p += 4;
        } else {
          if (!j.lit('[')) return false;
          have_feat = true;
          for (;;) {
            if (!j.num_row(row)) return false;
            feat_rows.push_back(row);
            if (j.lit(',')) continue;
            if (!j.lit(']')) return false;
            break;
          }
        }
      } else {
        return false;  // unknown key -> Python decides what it means
      }
      if (j.lit(',')) continue;
      break;
    }
  }
  if (!j.lit('}')) return false;
  if (!have_atom || !have_adj) return false;

  // shape + value checks (binary-wire representability)
  size_t n = atom.size();
  if (n == 0 || n > 0xffff || adj_e == 0 || adj_e > 0xff) return false;
  if (adj_rows.size() != adj_e * n) return false;
  for (auto& r : adj_rows)
    if (r.size() != n) return false;
  size_t f = 0;
  if (have_feat) {
    if (feat_rows.size() != n) return false;
    f = feat_rows[0].size();
    if (f == 0 || f > 0xffff) return false;
    for (auto& r : feat_rows)
      if (r.size() != f) return false;
  }
  for (double v : atom)  // range check first: int32_t(±inf) is UB
    if (!(v >= -2147483648.0 && v <= 2147483647.0) ||
        v != double(int32_t(v)))
      return false;
  for (auto& r : adj_rows)
    for (double v : r)
      if (!integral_u8(v)) return false;

  // emit: u16 n, u8 e, u8 0, u16 f, u16 0, i32[n], u8[e*n*n], f32[n*f]
  put_u16(out, uint32_t(n));
  out.push_back(char(adj_e));
  out.push_back('\0');
  put_u16(out, uint32_t(f));
  put_u16(out, 0);
  for (double v : atom) put_u32(out, uint32_t(int32_t(v)));
  for (auto& r : adj_rows)
    for (double v : r) out.push_back(char(uint8_t(v)));
  for (auto& r : feat_rows)
    for (double v : r) {
      float fv = float(v);
      uint32_t bits;
      memcpy(&bits, &fv, 4);
      put_u32(out, bits);
    }
  return true;
}

bool transcode_json_to_lng1(const std::string& in, std::string& out) {
  Jp j{in.data(), in.data() + in.size()};
  if (!j.lit('{')) return false;
  std::string k;
  if (!j.key(k) || k != "graphs" || !j.lit(':') || !j.lit('['))
    return false;
  if (j.peek() == ']') return false;  // empty -> Python's 400 text
  out.assign("LNG1\0\0\0\0", 8);
  uint32_t count = 0;
  for (;;) {
    if (!transcode_graph(j, out)) return false;
    count++;
    if (count > 4096) return false;  // the Python decoder's cap
    if (j.lit(',')) continue;
    if (!j.lit(']')) return false;
    break;
  }
  if (!j.lit('}')) return false;
  j.ws();
  if (j.p != j.end) return false;
  out[4] = char(count & 0xff);
  out[5] = char((count >> 8) & 0xff);
  out[6] = char((count >> 16) & 0xff);
  out[7] = char((count >> 24) & 0xff);
  return true;
}

// LNP1 (u32 count, u32 tasks, f32 data) -> {"predictions": [[...]]}.
// %.9g round-trips float32 exactly, matching what json.dumps of the
// float64-widened .tolist() gives clients to within float32.
bool transcode_lnp1_to_json(const std::string& in, std::string& out) {
  if (in.size() < 12 || memcmp(in.data(), "LNP1", 4) != 0) return false;
  uint32_t count, tasks;
  memcpy(&count, in.data() + 4, 4);
  memcpy(&tasks, in.data() + 8, 4);
  if (in.size() != 12 + size_t(4) * count * tasks) return false;
  out.clear();
  out.reserve(size_t(16) * count * tasks + 32);
  out += "{\"predictions\": [";
  const char* d = in.data() + 12;
  char buf[32];
  for (uint32_t i = 0; i < count; i++) {
    out += i ? ", [" : "[";
    for (uint32_t t = 0; t < tasks; t++) {
      float v;
      memcpy(&v, d + size_t(4) * (size_t(i) * tasks + t), 4);
      int m = snprintf(buf, sizeof buf, "%.9g", double(v));
      if (t) out += ", ";
      out.append(buf, size_t(m));
    }
    out += "]";
  }
  out += "]}";
  return true;
}

const char* status_text(int code) {
  switch (code) {
    case 200: return "OK";
    case 400: return "Bad Request";
    case 404: return "Not Found";
    case 413: return "Payload Too Large";
    case 500: return "Internal Server Error";
    case 503: return "Service Unavailable";
    default:  return "OK";
  }
}

void append_response(Conn& c, int status, const std::string& body,
                     const std::string& ctype) {
  char head[256];
  int n = snprintf(head, sizeof head,
                   "HTTP/1.1 %d %s\r\n"
                   "Content-Type: %s\r\n"
                   "Content-Length: %zu\r\n"
                   "Connection: %s\r\n\r\n",
                   status, status_text(status), ctype.c_str(), body.size(),
                   c.keep_alive ? "keep-alive" : "close");
  c.out.append(head, size_t(n));
  c.out.append(body);
  if (!c.keep_alive) c.want_close = true;
}

// ---- epoll loop -----------------------------------------------------------

void arm(Server& s, Conn& c, bool out) {
  if (c.epollout == out) return;
  epoll_event ev{};
  ev.events = EPOLLIN | (out ? uint32_t(EPOLLOUT) : 0u);
  ev.data.fd = c.fd;
  epoll_ctl(s.epoll_fd, EPOLL_CTL_MOD, c.fd, &ev);
  c.epollout = out;
}

void close_conn(Server& s, int fd) {
  auto it = s.conns.find(fd);
  if (it == s.conns.end()) return;
  it->second.gen++;  // invalidate outstanding request ids
  epoll_ctl(s.epoll_fd, EPOLL_CTL_DEL, fd, nullptr);
  close(fd);
  s.conns.erase(it);
}

// flush c.out; returns false if the connection died
bool flush_out(Server& s, Conn& c) {
  while (c.out_off < c.out.size()) {
    ssize_t n = ::send(c.fd, c.out.data() + c.out_off,
                       c.out.size() - c.out_off, MSG_NOSIGNAL);
    if (n > 0) {
      c.out_off += size_t(n);
      continue;
    }
    if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
      arm(s, c, true);
      return true;
    }
    return false;  // peer went away
  }
  c.out.clear();
  c.out_off = 0;
  arm(s, c, false);
  return !(c.want_close && c.inflight == 0);
}

// returns false to close the connection
bool handle_parsed(Server& s, Conn& c) {
  // GETs answered inline, no Python involved
  if (c.method == "GET") {
    if (c.path == "/healthz") {
      append_response(c, 200, "{\"status\": \"ok\"}", "application/json");
    } else if (c.path == "/v1/models") {
      append_response(c, 200, s.models_json, "application/json");
    } else {
      append_response(c, 404, "{\"error\": \"not found\"}",
                      "application/json");
    }
    return true;
  }
  if (c.method != "POST") {
    append_response(c, 400, "{\"error\": \"bad method\"}",
                    "application/json");
    return true;
  }
  // POST /v1/models/<name>:predict
  int model_idx = -1;
  const std::string pre = "/v1/models/";
  const std::string suf = ":predict";
  if (c.path.size() > pre.size() + suf.size() &&
      c.path.compare(0, pre.size(), pre) == 0 &&
      c.path.compare(c.path.size() - suf.size(), suf.size(), suf) == 0) {
    std::string name =
        c.path.substr(pre.size(), c.path.size() - pre.size() - suf.size());
    for (size_t i = 0; i < s.models.size(); i++)
      if (s.models[i] == name) { model_idx = int(i); break; }
  }
  if (model_idx < 0) {
    append_response(c, 404, "{\"error\": \"no such model\"}",
                    "application/json");
    return true;
  }
  std::string body = c.in.substr(c.header_end, c.content_len);
  uint64_t id = req_id(c.fd, c.gen);
  // JSON-wire bodies that the binary codec can carry are rewritten to
  // LNG1 here (µs-scale on this thread) so the Python worker never
  // json.loads a schema-conforming request; the kJsonBit routes the
  // LNP1 answer back through transcode_lnp1_to_json
  if (!body.empty() && body[0] != 'L') {
    std::string bin;
    if (transcode_json_to_lng1(body, bin)) {
      body.swap(bin);
      id |= kJsonBit;
      s.transcoded.fetch_add(1, std::memory_order_relaxed);
    }
  }
  {
    std::lock_guard<std::mutex> lk(s.mu);
    if (s.queue.size() >= s.queue_cap) {
      append_response(c, 503, "{\"error\": \"overloaded\"}",
                      "application/json");
      return true;
    }
    s.queue.push_back(Request{id, model_idx, std::move(body)});
    c.inflight++;
  }
  s.cv.notify_one();
  return true;
}

// parse as many complete requests as the buffer holds
bool drain_in(Server& s, Conn& c) {
  for (;;) {
    if (!c.have_header) {
      size_t pos = c.in.find("\r\n\r\n");
      if (pos == std::string::npos) {
        if (c.in.size() > 64 * 1024) return false;  // absurd header
        return true;                                 // need more bytes
      }
      c.header_end = pos + 4;
      // request line
      size_t sp1 = c.in.find(' ');
      size_t sp2 = sp1 == std::string::npos ? std::string::npos
                                            : c.in.find(' ', sp1 + 1);
      if (sp2 == std::string::npos || sp1 > pos) return false;
      c.method = c.in.substr(0, sp1);
      c.path = c.in.substr(sp1 + 1, sp2 - sp1 - 1);
      // headers we care about (case-insensitive match on lowered copy)
      std::string head = c.in.substr(0, pos);
      for (auto& ch : head) ch = char(tolower(ch));
      c.content_len = 0;
      size_t cl = head.find("content-length:");
      if (cl != std::string::npos)
        c.content_len = strtoul(head.c_str() + cl + 15, nullptr, 10);
      c.keep_alive = head.find("connection: close") == std::string::npos;
      if (head.find(" http/1.0") != std::string::npos &&
          head.find("connection: keep-alive") == std::string::npos)
        c.keep_alive = false;
      if (c.content_len > 16 * 1024 * 1024) {
        append_response(c, 413, "{\"error\": \"too large\"}",
                        "application/json");
        c.want_close = true;
        return flush_out(s, c);
      }
      c.have_header = true;
    }
    if (c.in.size() < c.header_end + c.content_len) return true;
    if (!handle_parsed(s, c)) return false;
    c.in.erase(0, c.header_end + c.content_len);
    c.have_header = false;
    if (!c.out.empty() && !flush_out(s, c)) return false;
    if (c.in.empty()) return true;
  }
}

void drain_outbox(Server& s) {
  std::deque<Server::Out> batch;
  {
    std::lock_guard<std::mutex> lk(s.mu);
    batch.swap(s.outbox);
  }
  for (auto& o : batch) {
    auto it = s.conns.find(req_fd(o.id));
    if (it == s.conns.end() || it->second.gen != req_gen(o.id))
      continue;  // connection died while Python was computing
    Conn& c = it->second;
    c.inflight--;
    append_response(c, o.status, o.body, o.content_type);
    s.served.fetch_add(1, std::memory_order_relaxed);
    if (!flush_out(s, c)) close_conn(s, c.fd);
  }
}

void loop_thread(Server* s) {
  epoll_event evs[128];
  while (!s->stop.load(std::memory_order_relaxed)) {
    int n = epoll_wait(s->epoll_fd, evs, 128, 100);
    if (n < 0) {
      if (errno == EINTR) continue;
      break;
    }
    for (int i = 0; i < n; i++) {
      int fd = evs[i].data.fd;
      if (fd == s->wake_fd) {
        uint64_t junk;
        while (read(s->wake_fd, &junk, 8) == 8) {}
        drain_outbox(*s);
        continue;
      }
      if (fd == s->listen_fd) {
        for (;;) {
          int cfd = accept4(s->listen_fd, nullptr, nullptr, SOCK_NONBLOCK);
          if (cfd < 0) break;
          int one = 1;
          setsockopt(cfd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof one);
          epoll_event ev{};
          ev.events = EPOLLIN;
          ev.data.fd = cfd;
          epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, cfd, &ev);
          Conn c;
          c.fd = cfd;
          s->conns.emplace(cfd, std::move(c));
        }
        continue;
      }
      auto it = s->conns.find(fd);
      if (it == s->conns.end()) continue;
      Conn& c = it->second;
      bool ok = true;
      if (evs[i].events & (EPOLLHUP | EPOLLERR)) ok = false;
      if (ok && (evs[i].events & EPOLLOUT)) ok = flush_out(*s, c);
      if (ok && (evs[i].events & EPOLLIN)) {
        char buf[65536];
        for (;;) {
          ssize_t r = ::recv(fd, buf, sizeof buf, 0);
          if (r > 0) {
            c.in.append(buf, size_t(r));
            if (r < ssize_t(sizeof buf)) break;
            continue;
          }
          if (r == 0) { ok = false; break; }          // orderly shutdown
          if (errno == EAGAIN || errno == EWOULDBLOCK) break;
          ok = false;
          break;
        }
        if (ok) ok = drain_in(*s, c);
      }
      if (!ok) close_conn(*s, fd);
    }
    // periodic outbox sweep in case a wake raced the epoll_wait
    drain_outbox(*s);
  }
  // shutdown: close everything
  std::vector<int> fds;
  for (auto& kv : s->conns) fds.push_back(kv.first);
  for (int fd : fds) close_conn(*s, fd);
}

Server* get(int sid) {
  std::lock_guard<std::mutex> lk(g_servers_mu);
  auto it = g_servers.find(sid);
  return it == g_servers.end() ? nullptr : it->second;
}

}  // namespace

extern "C" {

// Start a front bound to host:port (port 0 = ephemeral). Returns a
// server id >= 1, or -1 on error. The bound port is written to *out_port.
int lnfront_start(const char* host, int port, int backlog, int* out_port) {
  auto* s = new Server();
  s->listen_fd = socket(AF_INET, SOCK_STREAM | SOCK_NONBLOCK, 0);
  if (s->listen_fd < 0) { delete s; return -1; }
  int one = 1;
  setsockopt(s->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(uint16_t(port));
  if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
    close(s->listen_fd); delete s; return -1;
  }
  if (bind(s->listen_fd, (sockaddr*)&addr, sizeof addr) < 0 ||
      listen(s->listen_fd, backlog > 0 ? backlog : 256) < 0) {
    close(s->listen_fd); delete s; return -1;
  }
  socklen_t alen = sizeof addr;
  getsockname(s->listen_fd, (sockaddr*)&addr, &alen);
  s->port = ntohs(addr.sin_port);
  if (out_port) *out_port = s->port;

  s->epoll_fd = epoll_create1(0);
  s->wake_fd = eventfd(0, EFD_NONBLOCK);
  epoll_event ev{};
  ev.events = EPOLLIN;
  ev.data.fd = s->listen_fd;
  epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, s->listen_fd, &ev);
  ev.data.fd = s->wake_fd;
  epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, s->wake_fd, &ev);

  int sid;
  {
    std::lock_guard<std::mutex> lk(g_servers_mu);
    sid = g_next_id++;
    g_servers[sid] = s;
  }
  s->loop = std::thread(loop_thread, s);
  return sid;
}

// Register a model name BEFORE taking traffic; returns its index.
int lnfront_register_model(int sid, const char* name) {
  Server* s = get(sid);
  if (!s) return -1;
  s->models.emplace_back(name);
  return int(s->models.size()) - 1;
}

// Static body for GET /v1/models (set once at startup).
void lnfront_set_models_json(int sid, const char* body) {
  Server* s = get(sid);
  if (s) s->models_json = body;
}

// Pull a deadline-coalesced batch of request bodies. Blocks up to
// first_timeout_ms for the FIRST request, then keeps collecting until
// max_n requests or deadline_ms elapses from the first. Bodies are
// packed back-to-back into buf (capacity buf_cap); per-request
// (id, offset, length, model_idx) land in the parallel arrays.
// Returns the number of requests (0 = timeout), or -1 after stop.
int lnfront_next_batch(int sid, int max_n, double first_timeout_ms,
                       double deadline_ms, uint64_t* ids, int32_t* offs,
                       int32_t* lens, int32_t* models, uint8_t* buf,
                       int32_t buf_cap) {
  Server* s = get(sid);
  if (!s) return -1;
  std::unique_lock<std::mutex> lk(s->mu);
  if (s->queue.empty()) {
    s->cv.wait_for(lk, std::chrono::duration<double, std::milli>(
                           first_timeout_ms),
                   [&] { return !s->queue.empty() || s->stop.load(); });
  }
  if (s->stop.load()) return -1;
  if (s->queue.empty()) return 0;
  auto deadline =
      Clock::now() + std::chrono::duration_cast<Clock::duration>(
                         std::chrono::duration<double, std::milli>(
                             deadline_ms));
  int n = 0;
  int32_t off = 0;
  while (n < max_n) {
    if (s->queue.empty()) {
      if (!s->cv.wait_until(lk, deadline, [&] {
            return !s->queue.empty() || s->stop.load();
          }))
        break;  // deadline hit
      if (s->stop.load()) break;
      if (s->queue.empty()) break;
    }
    Request& r = s->queue.front();
    if (off + int32_t(r.body.size()) > buf_cap) break;  // buffer full
    ids[n] = r.id;
    offs[n] = off;
    lens[n] = int32_t(r.body.size());
    models[n] = r.model_idx;
    memcpy(buf + off, r.body.data(), r.body.size());
    off += int32_t(r.body.size());
    s->queue.pop_front();
    n++;
  }
  return n;
}

// Respond to a request previously pulled with lnfront_next_batch.
// content_type 0 -> application/octet-stream, 1 -> application/json.
void lnfront_respond(int sid, uint64_t id, int status, const uint8_t* body,
                     int32_t len, int content_type) {
  Server* s = get(sid);
  if (!s) return;
  std::string b((const char*)body, size_t(len));
  // request arrived as JSON and was transcoded to LNG1: hand the
  // client JSON back. Python error responses (non-LNP1) are already
  // JSON and pass through untouched.
  if (id & kJsonBit) {
    std::string js;
    if (transcode_lnp1_to_json(b, js)) b.swap(js);
    content_type = 1;
  }
  {
    std::lock_guard<std::mutex> lk(s->mu);
    s->outbox.push_back(Server::Out{
        id, status, std::move(b),
        content_type == 1 ? "application/json" : "application/octet-stream"});
  }
  uint64_t one = 1;
  ssize_t rc = write(s->wake_fd, &one, 8);
  (void)rc;
}

uint64_t lnfront_served(int sid) {
  Server* s = get(sid);
  return s ? s->served.load(std::memory_order_relaxed) : 0;
}

// JSON bodies rewritten to the binary wire in handle_parsed (the
// Python-free request path); tests assert this moves.
uint64_t lnfront_transcoded(int sid) {
  Server* s = get(sid);
  return s ? s->transcoded.load(std::memory_order_relaxed) : 0;
}

// Direct transcoder handles so tests can pin the rewrites
// byte-for-byte against the Python codec (encode_graphs_binary /
// json.dumps) without a socket in the loop. dir 0: JSON -> LNG1;
// dir 1: LNP1 -> JSON. Returns bytes written, -1 if the body is not
// transcodable (the server's Python-fallback case), -2 if cap is too
// small.
int32_t lnfront_transcode(int dir, const uint8_t* in, int32_t len,
                          uint8_t* out, int32_t cap) {
  std::string src((const char*)in, size_t(len)), dst;
  bool ok = dir == 0 ? transcode_json_to_lng1(src, dst)
                     : transcode_lnp1_to_json(src, dst);
  if (!ok) return -1;
  if (int32_t(dst.size()) > cap) return -2;
  memcpy(out, dst.data(), dst.size());
  return int32_t(dst.size());
}

int lnfront_port(int sid) {
  Server* s = get(sid);
  return s ? s->port : -1;
}

void lnfront_stop(int sid) {
  Server* s;
  {
    std::lock_guard<std::mutex> lk(g_servers_mu);
    auto it = g_servers.find(sid);
    if (it == g_servers.end()) return;
    s = it->second;
    g_servers.erase(it);
  }
  s->stop.store(true);
  s->cv.notify_all();
  uint64_t one = 1;
  ssize_t rc = write(s->wake_fd, &one, 8);
  (void)rc;
  if (s->loop.joinable()) s->loop.join();
  close(s->listen_fd);
  close(s->epoll_fd);
  close(s->wake_fd);
  delete s;
}

}  // extern "C"
