// stub: Fix base + FixExternal callback/energy/virial API used by the
// client (signatures follow upstream src/fix_external.h)
#ifndef LMP_FIX_EXTERNAL_H
#define LMP_FIX_EXTERNAL_H
#include "lmptype.h"
namespace LAMMPS_NS {
class Fix {
 public:
  virtual ~Fix();
};
class FixExternal : public Fix {
 public:
  typedef void (*FnPtr)(void *, bigint, int, tagint *, double **,
                        double **);
  void set_callback(FnPtr, void *);
  void set_energy_global(double);
  void set_virial_global(double *);
};
}  // namespace LAMMPS_NS
#endif
