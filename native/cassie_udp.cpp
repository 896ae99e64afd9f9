// apex_tpu native runtime: real-robot UDP link layer.
//
// C++ rebuild of the capability of the reference's C UDP module
// (reference include/udp.h:23-58 + the CassieUdp python wrapper,
// cassiemujoco.py:404-482): a 2 kHz bidirectional link carrying PD commands
// to the robot and state-estimator packets back, with sequence-number
// delay/drop tracking.
//
// The exact Agility wire format (pack_pd_in_t / unpack_state_out_t inside
// the prebuilt .so) is not recoverable from headers, so this module defines
// apex_tpu's own documented format:
//   header: 2 bytes  [seq_out, seq_in_echo]
//   pd command payload:  10x float32 pTarget, 10x dTarget, 10x pGain,
//                        10x dGain, 10x ff torque            (200 bytes)
//   state payload: pelvis pos(3) quat(4) rotvel(3) transvel(3) accel(3),
//                  motor pos(10) vel(10) torque(10), joint pos(6) vel(6),
//                  left/right foot pos(3each) quat(4 each),
//                  terrain height(1)                          (73 floats)
// All little-endian float32.
//
// Build: make -C native   (produces libapex_udp.so; bound via ctypes in
// apex_tpu/runtime/udp_link.py)

#include <arpa/inet.h>
#include <cstdint>
#include <cstring>
#include <netinet/in.h>
#include <sys/socket.h>
#include <sys/time.h>
#include <unistd.h>

extern "C" {

constexpr int PD_FLOATS = 50;
constexpr int STATE_FLOATS = 73;
constexpr int HEADER_BYTES = 2;

struct PacketHeaderInfo {
  uint8_t seq_num_out;        // next outgoing sequence number
  uint8_t seq_num_in_last;    // latest received sequence number
  int delay;                  // (seq sent) - (seq echoed back): RTT in ticks
  int seq_num_in_diff;        // gap between consecutive received packets
};

// ---------------------------------------------------------------------------
// sockets (reference udp_init_host / udp_init_client, include/udp.h:31-38)
// ---------------------------------------------------------------------------

int apex_udp_init_host(const char *local_addr, uint16_t local_port) {
  int fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(local_port);
  addr.sin_addr.s_addr =
      local_addr && local_addr[0] ? inet_addr(local_addr) : INADDR_ANY;
  if (bind(fd, reinterpret_cast<sockaddr *>(&addr), sizeof(addr)) < 0) {
    close(fd);
    return -1;
  }
  return fd;
}

int apex_udp_init_client(const char *remote_addr, uint16_t remote_port,
                         const char *local_addr, uint16_t local_port) {
  int fd = apex_udp_init_host(local_addr, local_port);
  if (fd < 0) return -1;
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(remote_port);
  addr.sin_addr.s_addr = inet_addr(remote_addr);
  if (connect(fd, reinterpret_cast<sockaddr *>(&addr), sizeof(addr)) < 0) {
    close(fd);
    return -1;
  }
  return fd;
}

void apex_udp_close(int fd) { close(fd); }

// ---------------------------------------------------------------------------
// packet header tracking (reference process_packet_header, udp.h:52-55)
// ---------------------------------------------------------------------------

void apex_process_packet_header(PacketHeaderInfo *info,
                                const uint8_t *header_in,
                                uint8_t *header_out) {
  // delay: how stale is the echo of our sequence counter
  info->delay = (uint8_t)(info->seq_num_out - header_in[1]);
  info->seq_num_in_diff = (uint8_t)(header_in[0] - info->seq_num_in_last);
  info->seq_num_in_last = header_in[0];
  header_out[0] = ++info->seq_num_out;
  header_out[1] = header_in[0];
}

// ---------------------------------------------------------------------------
// pack / send / recv
// ---------------------------------------------------------------------------

int apex_send_pd(int fd, PacketHeaderInfo *info, const float *pd,
                 uint8_t last_seq_in) {
  uint8_t buf[HEADER_BYTES + PD_FLOATS * 4];
  uint8_t hin[2] = {last_seq_in, 0};
  apex_process_packet_header(info, hin, buf);
  std::memcpy(buf + HEADER_BYTES, pd, PD_FLOATS * 4);
  return (int)send(fd, buf, sizeof(buf), 0);
}

int apex_send_state(int fd, PacketHeaderInfo *info, const float *state,
                    uint8_t last_seq_in) {
  uint8_t buf[HEADER_BYTES + STATE_FLOATS * 4];
  uint8_t hin[2] = {last_seq_in, 0};
  apex_process_packet_header(info, hin, buf);
  std::memcpy(buf + HEADER_BYTES, state, STATE_FLOATS * 4);
  return (int)send(fd, buf, sizeof(buf), 0);
}

// Drain the socket and keep only the newest packet (reference
// get_newest_packet, udp.h:47-50). Returns payload float count, 0 if no
// packet, -1 on error. Non-blocking.
static int recv_newest(int fd, uint8_t *buf, int cap, uint8_t *seq_out) {
  int got = 0;
  while (true) {
    ssize_t n = recv(fd, buf, cap, MSG_DONTWAIT);
    if (n <= 0) break;
    got = (int)n;
  }
  if (got < HEADER_BYTES) return got == 0 ? 0 : -1;
  *seq_out = buf[0];
  return (got - HEADER_BYTES) / 4;
}

int apex_recv_newest_pd(int fd, float *pd, uint8_t *seq) {
  uint8_t buf[HEADER_BYTES + PD_FLOATS * 4];
  int n = recv_newest(fd, buf, sizeof(buf), seq);
  if (n >= PD_FLOATS) std::memcpy(pd, buf + HEADER_BYTES, PD_FLOATS * 4);
  return n;
}

int apex_recv_newest_state(int fd, float *state, uint8_t *seq) {
  uint8_t buf[HEADER_BYTES + STATE_FLOATS * 4];
  int n = recv_newest(fd, buf, sizeof(buf), seq);
  if (n >= STATE_FLOATS)
    std::memcpy(state, buf + HEADER_BYTES, STATE_FLOATS * 4);
  return n;
}

// ---------------------------------------------------------------------------
// raw-payload framing: 2-byte header + arbitrary payload. Used by the
// Agility-compatible wire codec (apex_tpu/runtime/agility_wire.py) to frame
// the exact pd_in_t (476 B) / state_out_t (493 B) packings
// (reference include/pd_in_t.h:20, include/state_out_t.h:20), so the link
// interoperates with the reference stack and real hardware.
// ---------------------------------------------------------------------------

int apex_send_raw(int fd, PacketHeaderInfo *info, const uint8_t *payload,
                  int len, uint8_t last_seq_in) {
  uint8_t buf[2048];
  if (len + HEADER_BYTES > (int)sizeof(buf)) return -1;
  uint8_t hin[2] = {last_seq_in, 0};
  apex_process_packet_header(info, hin, buf);
  std::memcpy(buf + HEADER_BYTES, payload, len);
  return (int)send(fd, buf, HEADER_BYTES + len, 0);
}

// Returns payload BYTE count of the newest packet (0 if none, -1 error).
int apex_recv_newest_raw(int fd, uint8_t *payload, int cap, uint8_t *seq) {
  uint8_t buf[2048];
  int want = cap + HEADER_BYTES > (int)sizeof(buf)
                 ? (int)sizeof(buf)
                 : cap + HEADER_BYTES;
  int got = 0;
  while (true) {
    ssize_t n = recv(fd, buf, want, MSG_DONTWAIT);
    if (n <= 0) break;
    got = (int)n;
  }
  if (got < HEADER_BYTES) return got == 0 ? 0 : -1;
  *seq = buf[0];
  int len = got - HEADER_BYTES;
  if (len > cap) len = cap;
  std::memcpy(payload, buf + HEADER_BYTES, len);
  return len;
}

// Blocking wait with timeout (ms) for any packet.
int apex_wait_for_packet(int fd, int timeout_ms) {
  fd_set set;
  FD_ZERO(&set);
  FD_SET(fd, &set);
  timeval tv{timeout_ms / 1000, (timeout_ms % 1000) * 1000};
  return select(fd + 1, &set, nullptr, nullptr, &tv);
}

}  // extern "C"
