// stub: Domain box geometry + periodicity flags used by the client
#ifndef LMP_DOMAIN_H
#define LMP_DOMAIN_H
namespace LAMMPS_NS {
class Domain {
 public:
  double xprd, yprd, zprd;
  double xy, xz, yz;
  int xperiodic, yperiodic, zperiodic;
};
}  // namespace LAMMPS_NS
#endif
