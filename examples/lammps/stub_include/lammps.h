// stub: LAMMPS_NS::LAMMPS with the members the client dereferences
#ifndef LMP_LAMMPS_H
#define LMP_LAMMPS_H
#include "mpi.h"
namespace LAMMPS_NS {
class Atom;
class Domain;
class Input;
class Modify;
class LAMMPS {
 public:
  LAMMPS(int, char **, MPI_Comm);
  ~LAMMPS();
  Atom *atom;
  Domain *domain;
  Input *input;
  Modify *modify;
};
}  // namespace LAMMPS_NS
#endif
