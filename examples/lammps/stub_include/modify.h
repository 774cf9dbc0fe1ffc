// stub: Modify::get_fix_by_id returning a Fix*
#ifndef LMP_MODIFY_H
#define LMP_MODIFY_H
#include <string>
namespace LAMMPS_NS {
class Fix;
class Modify {
 public:
  Fix *get_fix_by_id(const std::string &) const;
};
}  // namespace LAMMPS_NS
#endif
