// Native ingest fast path: classic-pcap record walk + Ethernet/IPv4/UDP/TCP
// payload geometry + padded-tensor fill.
//
// Replaces the role libpcap plays in the reference (pcap_open_offline /
// pcap_next_ex, serial.c:91,115) and the pointer-walking extractors
// (packet_dumping.h:87-139 UDP, :150-188 TCP) with batch routines over one
// flat capture buffer.  Semantics are bit-identical to the vectorized numpy
// implementation in io/decode.py (the conformance spec); tests assert
// equality on every fixture.
//
// Build: g++ -O3 -shared -fPIC -o libmsm_ingest.so pcap_ingest.cpp
// (done on demand by io/native.py).

#include <cstdint>
#include <cstring>

namespace {

inline uint32_t rd32(const uint8_t *p, bool swap) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  if (swap) v = __builtin_bswap32(v);
  return v;
}

}  // namespace

extern "C" {

// Walk the record chain; returns the number of complete records, or -1 on a
// truncated record when strict != 0.  Arrays may be null (count-only pass).
int64_t msm_parse_records(const uint8_t *buf, int64_t n, int swap, int strict,
                          int64_t *offsets, int64_t *caplens,
                          int64_t *origlens, int64_t *ts_sec,
                          int64_t *ts_frac) {
  int64_t pos = 24;  // global header
  int64_t count = 0;
  while (pos + 16 <= n) {
    uint32_t sec = rd32(buf + pos, swap);
    uint32_t frac = rd32(buf + pos + 4, swap);
    uint32_t incl = rd32(buf + pos + 8, swap);
    uint32_t orig = rd32(buf + pos + 12, swap);
    pos += 16;
    if (pos + (int64_t)incl > n) {
      if (strict) return -1;
      return count;
    }
    if (offsets) {
      offsets[count] = pos;
      caplens[count] = incl;
      origlens[count] = orig;
      ts_sec[count] = sec;
      ts_frac[count] = frac;
    }
    pos += incl;
    count++;
  }
  if (strict && pos != n) return -1;
  return count;
}

// Streaming record walk for iter_pcap: parse as many COMPLETE records as the
// buffer holds, up to batch_max, writing packet-data offsets (relative to
// buf) and metadata.  Returns the record count.  state[0] = bytes consumed
// (start of the next unparsed header); state[1] = stop status: 0 = buffer
// exhausted (state[2] = bytes needed from the consumed point to finish the
// next record: 16 for a partial header, else 16 + incl), 1 = batch_max
// reached, 2 = record larger than max_record (state[2] = its incl, for the
// caller's error message).  Oversize is checked before body completeness,
// matching the Python loop's error precedence.
int64_t msm_parse_stream(const uint8_t *buf, int64_t n, int swap,
                         int64_t batch_max, int64_t max_record,
                         int64_t *offsets, int64_t *caplens,
                         int64_t *origlens, int64_t *ts_sec, int64_t *ts_frac,
                         int64_t *state) {
  int64_t pos = 0, count = 0;
  state[1] = 1;  // overwritten by the breaks below; 1 = ran to batch_max
  state[2] = 0;
  while (count < batch_max) {
    if (pos + 16 > n) {
      state[1] = 0;
      state[2] = 16;
      break;
    }
    const uint32_t sec = rd32(buf + pos, swap);
    const uint32_t frac = rd32(buf + pos + 4, swap);
    const uint32_t incl = rd32(buf + pos + 8, swap);
    const uint32_t orig = rd32(buf + pos + 12, swap);
    if ((int64_t)incl > max_record) {
      state[1] = 2;
      state[2] = incl;
      break;
    }
    if (pos + 16 + (int64_t)incl > n) {
      state[1] = 0;
      state[2] = 16 + (int64_t)incl;
      break;
    }
    offsets[count] = pos + 16;
    caplens[count] = incl;
    origlens[count] = orig;
    ts_sec[count] = sec;
    ts_frac[count] = frac;
    pos += 16 + (int64_t)incl;
    count++;
  }
  state[0] = pos;
  return count;
}

// Streaming pcapng packet-block walk: parse runs of EPB (6) / SPB (3) /
// obsolete PB (2) blocks in the CURRENT section, mirroring
// io/pcap._parse_pcapng_block exactly.  Any other block type (SHB, IDB,
// NRB, custom, ...) stops the walk so the Python parser — which owns
// section/interface state — handles that one block.  Inputs: tsdiv =
// per-interface if_tsresol divisors (EPB/PB timestamps; out-of-range
// interface ids use the microsecond default, the late-IDB leniency),
// spb_snap = interface 0's snaplen (SPB caplen clipping; 0 = no clip).
// Outputs per packet: data_off (captured bytes start, relative to buf),
// caplen, origlen, ts_sec, ts_frac(usec).  state[0] = bytes consumed
// (start of the block that stopped the walk); state[1] = status:
//   0 = buffer exhausted (state[2] = bytes needed from consumed),
//   1 = batch_max reached,
//   2 = non-packet block (state[2] = its type; Python parses it),
//   3 = block larger than max_block (state[2] = its length),
//   4 = invalid block header (len < 12 or not 4-aligned),
//   5 = malformed packet block (caplen past body; state[2] = its type).
// Error-precedence matches the Python loop: oversize before invalid
// before completeness.
int64_t msm_parse_pcapng(const uint8_t *buf, int64_t n, int swap,
                         int64_t batch_max, int64_t max_block,
                         const int64_t *tsdiv, int64_t n_ifaces,
                         int64_t spb_snap, int64_t *data_off,
                         int64_t *caplens, int64_t *origlens,
                         int64_t *ts_sec, int64_t *ts_frac, int64_t *state) {
  int64_t pos = 0, count = 0;
  state[1] = 1;
  state[2] = 0;
  while (count < batch_max) {
    if (pos + 12 > n) {
      state[1] = 0;
      state[2] = 12;
      break;
    }
    const uint32_t btype = rd32(buf + pos, swap);
    if (btype != 2 && btype != 3 && btype != 6) {
      state[1] = 2;
      state[2] = btype;
      break;
    }
    const uint32_t blen = rd32(buf + pos + 4, swap);
    if ((int64_t)blen > max_block) {
      state[1] = 3;
      state[2] = blen;
      break;
    }
    if (blen < 12 || blen % 4) {
      state[1] = 4;
      state[2] = btype;
      break;
    }
    if (pos + (int64_t)blen > n) {
      state[1] = 0;
      state[2] = blen;
      break;
    }
    const uint8_t *body = buf + pos + 8;
    const int64_t body_len = (int64_t)blen - 12;
    if (btype == 6 || btype == 2) {  // EPB / obsolete PB (20B fixed heads)
      uint32_t iface, ts_hi, ts_lo, incl, orig;
      if (body_len < 20) {
        state[1] = 5;
        state[2] = btype;
        break;
      }
      if (btype == 6) {
        iface = rd32(body, swap);
        ts_hi = rd32(body + 4, swap);
        ts_lo = rd32(body + 8, swap);
        incl = rd32(body + 12, swap);
        orig = rd32(body + 16, swap);
      } else {  // PB: u16 iface, u16 drops, then the same ts/len fields
        uint16_t i16;
        std::memcpy(&i16, body, 2);
        if (swap) i16 = (uint16_t)((i16 >> 8) | (i16 << 8));
        iface = i16;
        ts_hi = rd32(body + 4, swap);
        ts_lo = rd32(body + 8, swap);
        incl = rd32(body + 12, swap);
        orig = rd32(body + 16, swap);
      }
      if (20 + (int64_t)incl > body_len) {
        state[1] = 5;
        state[2] = btype;
        break;
      }
      const uint64_t div =
          (int64_t)iface < n_ifaces ? (uint64_t)tsdiv[iface] : 1000000u;
      const uint64_t ticks = ((uint64_t)ts_hi << 32) | ts_lo;
      const uint64_t sec = ticks / div;
      if (sec > (uint64_t)INT64_MAX) {
        // Timestamp not representable as int64 seconds (corrupt/absurd
        // capture): malformed, exactly like the Python parser raises.
        state[1] = 5;
        state[2] = btype;
        break;
      }
      data_off[count] = pos + 8 + 20;
      caplens[count] = incl;
      origlens[count] = orig;
      ts_sec[count] = (int64_t)sec;
      // 128-bit multiply: (ticks % div) * 1e6 overflows uint64 for
      // divisors above ~1.8e13 (if_tsresol >= 14 decimal / 44 binary).
      ts_frac[count] = (int64_t)((unsigned __int128)(ticks % div) * 1000000u
                                 / div);
    } else {  // SPB: u32 origlen, data clipped to min(orig, snaplen, body)
      if (body_len < 4) {
        state[1] = 5;
        state[2] = btype;
        break;
      }
      const uint32_t orig = rd32(body, swap);
      int64_t incl = spb_snap ? (orig < spb_snap ? orig : spb_snap)
                              : (int64_t)orig;
      const int64_t avail = body_len - 4;
      if (incl > avail) incl = avail;
      data_off[count] = pos + 8 + 4;
      caplens[count] = incl;
      origlens[count] = orig;
      ts_sec[count] = 0;
      ts_frac[count] = 0;
    }
    pos += blen;
    count++;
  }
  state[0] = pos;
  return count;
}

// Validity + payload geometry for every packet; mirrors io/decode.py.
// mode: 0 = udp, 1 = tcp.  Outputs: valid[i] in {0,1}, payload_off[i]
// (relative to packet start), payload_len[i] (origlen arithmetic, >= 0).
void msm_decode(const uint8_t *buf, int64_t nbuf, const int64_t *offsets,
                const int64_t *caplens, const int64_t *origlens, int64_t n,
                int mode, int strict, uint8_t *valid, int64_t *payload_off,
                int64_t *payload_len) {
  for (int64_t i = 0; i < n; i++) {
    const int64_t off = offsets[i];
    const int64_t cap = caplens[i];
    const int64_t L = origlens[i];
    valid[i] = 0;
    payload_off[i] = 0;
    payload_len[i] = 0;

    bool ok = true;
    // Shared reads (guarded by caplen — the C reference would read heap
    // garbage here; spec says invalid, see decode.py module docs).
    const bool can_ihl = cap >= 15;
    const int64_t ihl = can_ihl ? (buf[off + 14] & 0x0F) : 0;
    const int64_t iplen = ihl * 4;
    const bool can_proto = cap >= 24;
    const int proto = can_proto ? buf[off + 14 + 9] : 0;

    bool ethertype_ok = true;
    if (strict) {
      ethertype_ok =
          cap >= 14 && ((buf[off + 12] << 8) | buf[off + 13]) == 0x0800;
    }

    int64_t poff;
    if (mode == 0) {  // UDP, packet_dumping.h:87-139
      ok = L >= 14;
      ok = ok && (L - 14) >= 20;
      ok = ok && can_ihl;
      ok = ok && (L - 14) >= iplen;  // NOTE: no iplen >= 20 check (quirk)
      ok = ok && can_proto && proto == 17;
      ok = ok && (L - 14 - iplen) >= 8;
      if (strict) ok = ok && iplen >= 20 && ethertype_ok;
      poff = 14 + iplen + 8;  // +8 == sizeof(pointer) coincidence, :133
    } else {  // TCP, packet_dumping.h:150-188 — no protocol check (quirk)
      ok = can_ihl;
      ok = ok && iplen >= 20;
      const int64_t thoff_idx = off + 14 + iplen + 12;
      const bool can_thoff = cap >= 14 + iplen + 13;
      ok = ok && can_thoff;
      const int64_t tcplen = ok ? ((buf[thoff_idx] >> 4) * 4) : 0;
      ok = ok && tcplen >= 20;
      if (strict) ok = ok && can_proto && proto == 6 && ethertype_ok;
      poff = 14 + iplen + (ok ? ((buf[thoff_idx] >> 4) * 4) : 0);
    }
    ok = ok && (L - poff) >= 0;  // C would wrap unsigned; we reject
    if (ok) {
      valid[i] = 1;
      payload_off[i] = poff;
      payload_len[i] = L - poff;
    }
  }
}

// Scatter variable-length payload slices into a zero-padded [n, lmax] tensor.
void msm_fill_padded(const uint8_t *buf, const int64_t *starts,
                     const int64_t *lens, int64_t n, uint8_t *out,
                     int64_t lmax) {
  for (int64_t i = 0; i < n; i++) {
    const int64_t len = lens[i];
    if (len > 0) std::memcpy(out + i * lmax, buf + starts[i], (size_t)len);
  }
}

// Scatter segment slices to arbitrary (row, offset) destinations in a
// zero-initialized [*, stride] tensor — the flow-reassembly fill
// (io/flows.py): segment s copies buf[src[s] .. src[s]+len[s]) to
// out[rows[s]*stride + offs[s]].  The caller guarantees in-bounds
// geometry (offsets/lengths derive from the same decode that sized the
// output); zero-length segments are skipped.
void msm_scatter_segments(const uint8_t *buf, const int64_t *src,
                          const int64_t *lens, const int64_t *rows,
                          const int64_t *offs, int64_t n, uint8_t *out,
                          int64_t stride) {
  for (int64_t s = 0; s < n; s++) {
    const int64_t len = lens[s];
    if (len > 0)
      std::memcpy(out + rows[s] * stride + offs[s], buf + src[s],
                  (size_t)len);
  }
}

// Two-pointer packing plan over length-sorted segments (the exact
// ops/bucketing.pack_plan algorithm): each row starts with the largest
// remaining segment, then fills with the smallest that still fit (+1 for
// the separator).  order is ascending-length segment indices (zero-length
// already filtered); outputs the flattened member list, per-row member
// counts and per-row fills; returns the row count.
int64_t msm_pack_plan(const int64_t *lengths, const int64_t *order,
                      int64_t n_ord, int64_t width, int64_t *members,
                      int64_t *per_row, int64_t *fills) {
  int64_t lo = 0, hi = n_ord - 1, m = 0, r = 0;
  while (lo <= hi) {
    const int64_t idx = order[hi--];
    members[m++] = idx;
    int64_t fill = lengths[idx];
    int64_t cnt = 1;
    while (lo <= hi && fill + 1 + lengths[order[lo]] <= width) {
      members[m++] = order[lo];
      fill += 1 + lengths[order[lo]];
      lo++;
      cnt++;
    }
    per_row[r] = cnt;
    fills[r] = fill;
    r++;
  }
  return r;
}

// Materialize a pack_plan: copy each row's member segments into a
// zero-initialized [n_rows, width] tensor with one 0x00 separator byte
// between segments (ops/bucketing.pack_rows semantics).  members is the
// flattened per-row member index list; per_row gives each row's member
// count.
void msm_pack_fill(const uint8_t *payloads, int64_t stride,
                   const int64_t *lengths, const int64_t *members,
                   const int64_t *per_row, int64_t n_rows, int64_t width,
                   uint8_t *out) {
  int64_t m = 0;
  for (int64_t r = 0; r < n_rows; r++) {
    uint8_t *row = out + r * width;
    int64_t pos = 0;
    for (int64_t k = 0; k < per_row[r]; k++, m++) {
      const int64_t idx = members[m];
      const int64_t len = lengths[idx];
      if (pos) pos += 1;  // separator byte is already 0
      std::memcpy(row + pos, payloads + idx * stride, (size_t)len);
      pos += len;
    }
  }
}

}  // extern "C"
