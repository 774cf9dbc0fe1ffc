// stub: Atom members used by the client (per-atom type array)
#ifndef LMP_ATOM_H
#define LMP_ATOM_H
namespace LAMMPS_NS {
class Atom {
 public:
  int *type;
};
}  // namespace LAMMPS_NS
#endif
