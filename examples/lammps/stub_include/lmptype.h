// stub: integer typedefs as in upstream src/lmptype.h (smallbig build)
#ifndef LMP_LMPTYPE_H
#define LMP_LMPTYPE_H
#include <cstdint>
namespace LAMMPS_NS {
typedef int64_t bigint;
typedef int tagint;
}  // namespace LAMMPS_NS
#endif
