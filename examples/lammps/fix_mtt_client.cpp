// LAMMPS "fix external" adapter for a `mtt-tpu serve` force server.
//
// Build (plugin or in-tree): compile this file with your LAMMPS build
// (it only uses the public fix-external callback API) and register the
// callback from an input script via `fix ... external pf/callback`.
// The simplest integration is the single-file driver below: it links
// against liblammps and runs an input deck, attaching this callback.
//
//   c++ -O2 -o lmp_mtt fix_mtt_client.cpp -llammps
//   ./lmp_mtt in.lammps 127.0.0.1 31415
//
// Protocol: metatrain_tpu/serve.py (little-endian; MTTC magic, natoms,
// cell 9xf64 Angstrom, pbc 3xu8, types i32, positions f64; reply:
// status u32, energy f64 (eV), virial 9xf64 (eV), forces f64 (eV/A)).
// Unit note: use `units metal` (Angstrom / eV / eV/A) in the deck.
//
// The server keeps the model hot on the TPU between calls (compiled
// executables + cached device batches + Verlet-skin neighbor reuse), so
// per-step cost is one socket round-trip + one device dispatch.

#include <arpa/inet.h>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <netinet/in.h>
#include <string>
#include <sys/socket.h>
#include <unistd.h>
#include <vector>

#include "lammps.h"
#include "atom.h"
#include "domain.h"
#include "fix_external.h"
#include "input.h"
#include "library.h"
#include "modify.h"

using namespace LAMMPS_NS;

static int g_sock = -1;
static std::vector<int> g_type_to_z;  // LAMMPS type -> atomic number

static void send_all(const void *buf, size_t n) {
  const char *p = static_cast<const char *>(buf);
  while (n) {
    ssize_t w = ::send(g_sock, p, n, 0);
    if (w <= 0) { perror("send"); exit(1); }
    p += w; n -= (size_t)w;
  }
}

static void recv_all(void *buf, size_t n) {
  char *p = static_cast<char *>(buf);
  while (n) {
    ssize_t r = ::recv(g_sock, p, n, 0);
    if (r <= 0) { perror("recv"); exit(1); }
    p += r; n -= (size_t)r;
  }
}

// fix external pf/callback: LAMMPS hands us positions, we fill forces
// and set the potential energy + virial on the fix.
static void mtt_callback(void *ptr, bigint /*timestep*/, int nlocal,
                         tagint * /*ids*/, double **x, double **f) {
  LAMMPS *lmp = static_cast<LAMMPS *>(ptr);
  auto *fix = static_cast<FixExternal *>(
      lmp->modify->get_fix_by_id("mtt"));

  // request: cell (row-major h-matrix), pbc, types as atomic numbers
  uint32_t natoms = (uint32_t)nlocal;
  double cell[9] = {lmp->domain->xprd, 0, 0,
                    lmp->domain->xy, lmp->domain->yprd, 0,
                    lmp->domain->xz, lmp->domain->yz, lmp->domain->zprd};
  uint8_t pbc[3] = {(uint8_t)lmp->domain->xperiodic,
                    (uint8_t)lmp->domain->yperiodic,
                    (uint8_t)lmp->domain->zperiodic};
  std::vector<int32_t> z(natoms);
  for (uint32_t i = 0; i < natoms; ++i)
    z[i] = g_type_to_z[lmp->atom->type[i]];
  std::vector<double> pos(3 * natoms);
  for (uint32_t i = 0; i < natoms; ++i)
    for (int k = 0; k < 3; ++k) pos[3 * i + k] = x[i][k];

  send_all("MTTC", 4);
  send_all(&natoms, 4);
  send_all(cell, 72);
  send_all(pbc, 3);
  send_all(z.data(), 4 * natoms);
  send_all(pos.data(), 24 * natoms);

  uint32_t status; recv_all(&status, 4);
  if (status != 0) {
    uint32_t len; recv_all(&len, 4);
    std::string msg(len, '\0'); recv_all(&msg[0], len);
    fprintf(stderr, "mtt server error: %s\n", msg.c_str());
    exit(1);
  }
  double energy; recv_all(&energy, 8);
  double virial[9]; recv_all(virial, 72);
  std::vector<double> forces(3 * natoms);
  recv_all(forces.data(), 24 * natoms);

  for (uint32_t i = 0; i < natoms; ++i)
    for (int k = 0; k < 3; ++k) f[i][k] = forces[3 * i + k];
  fix->set_energy_global(energy);
  // LAMMPS virial order: xx, yy, zz, xy, xz, yz
  double v[6] = {virial[0], virial[4], virial[8],
                 virial[1], virial[2], virial[5]};
  fix->set_virial_global(v);
}

int main(int argc, char **argv) {
  if (argc < 4) {
    fprintf(stderr,
            "usage: %s in.lammps host port [Z_of_type1 Z_of_type2 ...]\n",
            argv[0]);
    return 1;
  }
  g_sock = ::socket(AF_INET, SOCK_STREAM, 0);
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)atoi(argv[3]));
  inet_pton(AF_INET, argv[2], &addr.sin_addr);
  if (::connect(g_sock, (sockaddr *)&addr, sizeof(addr)) != 0) {
    perror("connect"); return 1;
  }
  g_type_to_z.assign(1, 0);
  for (int i = 4; i < argc; ++i) g_type_to_z.push_back(atoi(argv[i]));

  LAMMPS *lmp = new LAMMPS(0, nullptr, MPI_COMM_WORLD);
  lmp->input->file(argv[1]);  // deck must define `fix mtt all external
                              // pf/callback 1 1` before `run`
  auto *fix = static_cast<FixExternal *>(
      lmp->modify->get_fix_by_id("mtt"));
  fix->set_callback(mtt_callback, lmp);
  lmp->input->one("run 1000");
  delete lmp;
  ::close(g_sock);
  return 0;
}
