// stub: Input::file / Input::one
#ifndef LMP_INPUT_H
#define LMP_INPUT_H
namespace LAMMPS_NS {
class Input {
 public:
  void file(const char *);
  char *one(const char *);
};
}  // namespace LAMMPS_NS
#endif
